from .model import Rule, Ruleset, load_ruleset, default_image_ruleset  # noqa: F401
from .compiler import compile_ruleset, violations_for, VIOLATION_SCHEMA  # noqa: F401
