"""Output manifest + batch checkpointing — the failure-handling subsystem.

The reference had none (SURVEY.md §5: jobs are one-shot, recovery is Spark
lineage retry; the only trace is commented-out per-bin success bookkeeping,
SparkBinKmerCounter.scala:608-639).  The TPU design makes both explicit:

* ``write_manifest`` records the run config, per-bin files and row counts,
  and a table checksum, so output completeness is verifiable
  (``verify_output``) instead of inferred from "all B files appeared".
* ``BatchCheckpointer`` persists per-batch partial tables (npz) with a
  cursor, so an interrupted run resumes from the last completed batch —
  the natural checkpoint boundary is the post-extraction partial table
  (SURVEY.md §5 "checkpoint/resume").
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np

MANIFEST = "manifest.json"


def table_checksum(words: np.ndarray, counts: np.ndarray) -> str:
    h = hashlib.sha256()
    h.update(np.ascontiguousarray(words).tobytes())
    h.update(np.ascontiguousarray(counts.astype(np.int64)).tobytes())
    return h.hexdigest()


def write_manifest(out_dir: str, cfg_dict: dict, words, counts, bins) -> str:
    os.makedirs(out_dir, exist_ok=True)
    uniq, idx = np.unique(bins, return_counts=True) if bins.size else ([], [])
    manifest = {
        "config": cfg_dict,
        "n_unique": int(words.shape[0]),
        "n_instances": int(counts.sum()),
        "checksum": table_checksum(words, counts),
        "bins": {int(b): int(c) for b, c in zip(uniq, idx)},
    }
    path = os.path.join(out_dir, MANIFEST)
    with open(path, "w") as f:
        json.dump(manifest, f, indent=2)
    return path


def verify_output(out_dir: str) -> dict:
    """Check every bin file recorded in the manifest exists with the right
    number of k-mer lines.  Returns {ok, missing, mismatched}."""
    with open(os.path.join(out_dir, MANIFEST)) as f:
        manifest = json.load(f)
    missing, mismatched = [], []
    for b, n_rows in manifest["bins"].items():
        p = os.path.join(out_dir, f"bin{b}")
        if not os.path.exists(p):
            missing.append(int(b))
            continue
        data = open(p, "rb").read()
        if data.endswith(b"EOF"):
            data = data[:-3]
        if len(data.splitlines()) != n_rows:
            mismatched.append(int(b))
    return {"ok": not missing and not mismatched, "missing": missing, "mismatched": mismatched}


class BatchCheckpointer:
    """Persist per-batch partial tables so a job can resume mid-file."""

    def __init__(self, ckpt_dir: str):
        self.dir = ckpt_dir
        os.makedirs(ckpt_dir, exist_ok=True)
        self.cursor_path = os.path.join(ckpt_dir, "cursor.json")

    def completed_batches(self) -> int:
        if not os.path.exists(self.cursor_path):
            return 0
        with open(self.cursor_path) as f:
            return json.load(f)["completed"]

    def save_batch(self, index: int, words, counts, bins) -> None:
        np.savez(
            os.path.join(self.dir, f"part{index:06d}.npz"),
            words=words, counts=counts, bins=bins,
        )
        tmp = self.cursor_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"completed": index + 1}, f)
        os.replace(tmp, self.cursor_path)  # atomic cursor update

    def load_parts(self) -> list:
        parts = []
        for i in range(self.completed_batches()):
            z = np.load(os.path.join(self.dir, f"part{i:06d}.npz"))
            parts.append((z["words"], z["counts"], z["bins"]))
        return parts

    def clear(self) -> None:
        for f in os.listdir(self.dir):
            os.remove(os.path.join(self.dir, f))
