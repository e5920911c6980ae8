"""Worker-side protobuf bootstrap for `transformWithStateInPandas`.

Spark 4.x's arbitrary-state v2 operator talks to a per-partition state
server over a protobuf protocol: the PYTHON WORKER (a fresh process the
JVM spawns) imports `google.protobuf` to drive it. This container has no
pip `protobuf` distribution, but it does ship a pure-Python protobuf
runtime inside the google-cloud-sdk appengine platform tree with
unmodified `google.protobuf` import paths. This module makes that runtime
importable in the spawned workers WITHOUT touching the interpreter's
site-packages:

- build (once per host) an isolated shim directory containing ONLY a
  `google/` namespace package and a `google/protobuf` symlink into the
  vendored runtime — putting the whole appengine tree on sys.path would
  leak dozens of unrelated packages into every worker;
- prepend it to PYTHONPATH in `sc.environment`, which Spark copies into
  the worker ProcessBuilder env (and os.environ, for workers forked
  before a JVM exists);
- set protobuf's own documented escape hatch
  TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK for the one-minor-version
  gencode/runtime skew (pyspark ships 6.33-generated stubs, the vendored
  runtime is 6.32 — the generated descriptors use no 6.33-only feature).

On an environment with a real `protobuf` install this is a no-op: the
worker inherits the driver's site-packages and imports it directly.
"""

from __future__ import annotations

import os
import tempfile
from pathlib import Path

# Vendored pure-Python protobuf runtimes with clean `google.protobuf`
# import paths, newest-first. Override/extend with the env var when a
# deployment keeps one elsewhere.
_VENDOR_CANDIDATES = (
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
)


def _worker_has_protobuf() -> bool:
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def _build_shim_dir(vendor_base: Path) -> Path:
    """Materialize the minimal shim: <tmp>/cdc_dedupe_pb_shim/google/
    {__init__.py, protobuf -> vendored}. Idempotent per host."""
    shim = Path(tempfile.gettempdir()) / "cdc_dedupe_pb_shim"
    pkg = shim / "google"
    pkg.mkdir(parents=True, exist_ok=True)
    init = pkg / "__init__.py"
    if not init.exists():
        init.write_text(
            '__path__ = __import__("pkgutil").extend_path(__path__, __name__)\n'
        )
    link = pkg / "protobuf"
    target = vendor_base / "google" / "protobuf"
    if link.is_symlink():
        if link.resolve() != target.resolve():
            link.unlink()
    if not link.exists():
        link.symlink_to(target)
    return shim


def ensure_tws_protobuf(spark) -> None:
    """Make `google.protobuf` importable in the python workers the
    transformWithStateInPandas operator spawns. Call BEFORE building the
    TWS plan — the worker env is captured when the UDF is wrapped."""
    env_override = os.environ.get("SPARK_GRAFT_PROTOBUF_VENDOR")
    candidates = ((env_override,) if env_override else ()) + _VENDOR_CANDIDATES
    sc = spark.sparkContext
    if _worker_has_protobuf():
        return
    for base in candidates:
        vendor = Path(base)
        if (vendor / "google" / "protobuf" / "runtime_version.py").is_file():
            shim = str(_build_shim_dir(vendor))
            for env in (os.environ, sc.environment):
                prev = env.get("PYTHONPATH", "")
                if shim not in prev.split(":"):
                    env["PYTHONPATH"] = shim + ((":" + prev) if prev else "")
                env["TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK"] = "true"
            return
    raise ImportError(
        "transformWithStateInPandas needs the python `protobuf` package in "
        "the Spark workers; none is installed and no vendored runtime was "
        "found (set SPARK_GRAFT_PROTOBUF_VENDOR to a directory containing "
        "google/protobuf)."
    )
