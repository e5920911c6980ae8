"""Query surface: importing this package populates the registry."""

from __future__ import annotations

from .registry import REGISTRY, QueryDef, register  # noqa: F401

# Group modules register themselves on import.
from . import cdc  # noqa: F401,E402
from . import relational  # noqa: F401,E402
from . import relational_ext  # noqa: F401,E402
from . import scalar  # noqa: F401,E402
from . import streaming  # noqa: F401,E402
from . import llm  # noqa: F401,E402
from . import llm_ext  # noqa: F401,E402
