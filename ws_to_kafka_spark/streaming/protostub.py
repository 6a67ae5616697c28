"""Make ``google.protobuf`` importable for transformWithState.

PySpark's transformWithState Python worker speaks a protobuf protocol
to the JVM state server (pyspark/sql/streaming/proto/StateMessage_pb2),
so the API is unusable in containers that don't ship ``google.protobuf``
— this repo vendors a minimal clean-room wire-format runtime
(vendor/protostub, see its _mini.py docstring for scope) and this hook
activates it ONLY when the real package is absent.

Call :func:`ensure_protobuf` BEFORE creating the SparkSession: the stub
must be visible to every process in the tree — the driver (imports the
pb2 when building the plan), the JVM-spawned driver-side initializer
(transform_with_state_driver_worker), and the executors' Python workers
— and they all inherit ``PYTHONPATH`` from the process that launches
the JVM, which is the only channel that reaches workers spawned later.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

#: vendor/protostub relative to the repository root (two levels above
#: this package module).
_STUB_DIR = Path(__file__).resolve().parents[2] / "vendor" / "protostub"


def ensure_protobuf() -> str:
    """Return "real" when google.protobuf is installed; otherwise put the
    vendored stub on ``sys.path`` AND ``PYTHONPATH`` (for JVM-spawned
    Python workers) and return "stub". Raises ImportError if neither
    works."""
    try:
        import google.protobuf  # noqa: F401

        return "real"
    except ImportError:
        pass
    stub = str(_STUB_DIR)
    if stub not in sys.path:
        sys.path.insert(0, stub)
    parts = os.environ.get("PYTHONPATH", "")
    if stub not in parts.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            stub + (os.pathsep + parts if parts else "")
        )
    import google.protobuf  # noqa: F401  (raises if the stub is broken)

    return "stub"
