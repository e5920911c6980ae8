"""Query surface: importing this package populates the registry."""

from __future__ import annotations

from .registry import REGISTRY, QueryDef, register  # noqa: F401

# Group modules register themselves on import. Registration order matters:
# the driver's correctness harness verifies at most the first 50 registry
# entries, so the llm/llm_ext groups (unchecked in round 1) register first
# and the groups already hash-verified in CORRECTNESS_r01 rotate to the back.
from . import llm  # noqa: F401,E402
from . import llm_ext  # noqa: F401,E402
from . import streaming  # noqa: F401,E402
from . import relational_ext  # noqa: F401,E402
from . import scalar  # noqa: F401,E402
from . import cdc  # noqa: F401,E402
from . import relational  # noqa: F401,E402
