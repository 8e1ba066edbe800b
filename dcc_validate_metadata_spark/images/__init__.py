from .codec import (  # noqa: F401
    average_phash,
    decode_image,
    encode_image,
    encode_png,
    decode_png,
    psnr,
)
