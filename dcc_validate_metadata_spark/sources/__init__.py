from .catalog import TABLES, load_tables, register_views  # noqa: F401
from .image_table import (  # noqa: F401
    IMAGE_SCHEMA,
    PARTITION_COLS,
    generate_image_fixture,
    generate_image_table_distributed,
    load_image_table,
    ontology_terms_rows,
    sample_edges_rows,
)
