"""Config -> logical-plan compilation (the engine's "planner" layer).

The reference assembles its physical pipeline by hand at startup
(WatchStream.java:100-115); here the same routing config compiles to pure
declarative DataFrame plans that Catalyst then optimizes — the split
between plan construction (this package) and execution/sinks
(``streaming.pipeline``) is the Spark-idiomatic replacement for the
reference's Reactor graph assembly.
"""

from .watch_plan import compile_watch_plan

__all__ = ["compile_watch_plan"]
