"""Sources & sinks (SURVEY §2.1)."""

from .tables import TABLES, load_table, register_views  # noqa: F401
from .manifest import read_manifest  # noqa: F401
