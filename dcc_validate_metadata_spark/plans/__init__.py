from .manifest import Manifest  # noqa: F401
from .pipeline import ValidationResult, run_validation  # noqa: F401
