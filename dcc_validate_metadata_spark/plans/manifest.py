"""Checkpointed per-partition manifest (lineage + metrics).

Replaces the reference's Celery/WebSocket progress plumbing
(``metadata_validation_conversion/helpers.py:67-109``, ``ws/consumers.py``
— SURVEY.md §2.8) with the batch-native equivalent: after a run commits
its outputs (idempotent dynamic-partition overwrite), one JSONL manifest
file is written atomically (tmp + rename) recording, per table partition:
status, row/violation counts, verdict, input lineage, and timestamps.

Resume = read the manifest, skip partitions already ``done``. Combined
with partition-overwrite writes this gives effective exactly-once on
restart (at-least-once Celery + visibility timeout in the reference).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from pathlib import Path


class Manifest:
    def __init__(self, out_dir: str | Path):
        self.dir = Path(out_dir) / "manifest"
        self.dir.mkdir(parents=True, exist_ok=True)

    def completed(self) -> set[tuple]:
        """Set of (fmt, bucket) keys already validated."""
        done = set()
        for f in sorted(self.dir.glob("run-*.jsonl")):
            for line in f.read_text().splitlines():
                rec = json.loads(line)
                if rec.get("status") == "done":
                    done.add((rec["fmt"], int(rec["bucket"])))
        return done

    def completed_rulesets(self) -> set[str]:
        """Ruleset fingerprints of the LATEST ``done`` record per
        partition (legacy records without one report as ``'unknown'``).
        Only the latest matters: a resume=False re-validation overwrote
        the partition's outputs, so older manifest history must not
        poison future resumes."""
        latest: dict[tuple, str] = {}
        for rec in self.records():  # files sorted by run timestamp
            if rec.get("status") == "done":
                latest[(rec["fmt"], int(rec["bucket"]))] = rec.get(
                    "lineage", {}
                ).get("ruleset", "unknown")
        return set(latest.values())

    def records(self) -> list[dict]:
        out = []
        for f in sorted(self.dir.glob("run-*.jsonl")):
            out.extend(json.loads(line) for line in f.read_text().splitlines())
        return out

    def commit(self, rows: list[dict]) -> Path:
        """Atomically append one run's partition records."""
        run_id = f"run-{time.strftime('%Y%m%dT%H%M%S')}-{uuid.uuid4().hex[:8]}"
        tmp = self.dir / f".{run_id}.tmp"
        final = self.dir / f"{run_id}.jsonl"
        with open(tmp, "w") as fh:
            for r in rows:
                fh.write(json.dumps(r) + "\n")
            fh.flush()
            os.fsync(fh.fileno())
        os.rename(tmp, final)
        return final
