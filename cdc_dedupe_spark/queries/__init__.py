"""Query surface: importing this package populates the registry."""

from __future__ import annotations

from .registry import REGISTRY, QueryDef, register  # noqa: F401

# Group modules register themselves on import.
from . import cdc  # noqa: F401,E402

try:  # groups added incrementally; keep imports tolerant during build-out
    from . import relational  # noqa: F401
except ImportError:
    pass
try:
    from . import scalar  # noqa: F401
except ImportError:
    pass
try:
    from . import streaming  # noqa: F401
except ImportError:
    pass
try:
    from . import llm  # noqa: F401
except ImportError:
    pass
