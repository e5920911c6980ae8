"""File-backed fake Redis Streams client for the redis_stream data source
tests. State lives in a directory (one JSONL file per stream) so driver
and executor processes see the same streams without a server.

Entry ids are synthesized as "1-<line number>" — monotonic per stream,
which is all the source's offset logic relies on.
"""

from __future__ import annotations

import json
import os
from pathlib import Path


class FakeRedis:
    def __init__(self, root: str) -> None:
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    def _path(self, stream: str) -> Path:
        return self.root / f"{stream}.jsonl"

    def _lines(self, stream: str) -> list[str]:
        p = self._path(stream)
        return p.read_text().splitlines() if p.exists() else []

    def _entries(self, stream: str) -> list[tuple[str, dict]]:
        out = []
        for i, line in enumerate(self._lines(stream), start=1):
            if line and line != "\x00":  # skip xdel tombstones
                out.append((f"1-{i}", json.loads(line)))
        return out

    # --- the client surface the source uses ---

    def xadd(self, stream: str, fields: dict) -> str:
        with open(self._path(stream), "a") as f:
            f.write(json.dumps(dict(fields)) + os.linesep)
        return f"1-{len(self._lines(stream))}"

    def xinfo_stream(self, stream: str) -> dict:
        lines = self._lines(stream)
        if not lines:
            raise KeyError(f"no such stream {stream!r}")
        # like Redis, last-generated-id survives XDEL of every entry
        return {"last-generated-id": f"1-{len(lines)}", "length": len(self._entries(stream))}

    def xdel(self, stream: str, *record_ids: str) -> int:
        """Delete entries by id. Line positions (and so the synthetic ids of
        the REMAINING entries) are preserved by tombstoning."""
        ids = set(record_ids)
        p = self._path(stream)
        if not p.exists():
            return 0
        lines = p.read_text().splitlines()
        n = 0
        for i in range(len(lines)):
            if f"1-{i + 1}" in ids and lines[i] != "\x00":
                lines[i] = "\x00"
                n += 1
        p.write_text("\n".join(lines) + os.linesep)
        return n

    def xrange(
        self, stream: str, start: str = "-", end: str = "+", count: int | None = None
    ) -> list[tuple[str, dict]]:
        def key(record_id: str) -> tuple[int, int]:
            ms, _, seq = record_id.partition("-")
            return int(ms), int(seq or 0)

        exclusive = start.startswith("(")
        lo = key(start.lstrip("(")) if start not in ("-",) else (0, 0)
        hi = key(end) if end != "+" else (1 << 62, 0)
        out = []
        for rid, fields in self._entries(stream):
            k = key(rid)
            if (k > lo if exclusive else k >= lo) and k <= hi:
                out.append((rid, fields))
        return out[:count] if count is not None else out


def make_client(options: dict) -> FakeRedis:
    return FakeRedis(options["fake_dir"])
