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


TABLE_SIDECAR = "table.npz"


def write_table_sidecar(out_dir: str, words, counts, bins) -> str:
    """Binary snapshot of the final table next to the bin files — lets
    repair_output rewrite damaged bins with zero recounting.  Validated
    against the manifest checksum at load time, so a stale or truncated
    sidecar can never silently repair with wrong counts."""
    path = os.path.join(out_dir, TABLE_SIDECAR)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:  # file handle: savez can't rename-append .npz
        np.savez(f, words=words, counts=counts, bins=bins)
    os.replace(tmp, path)  # atomic: never a truncated sidecar
    return path


def load_table_sidecar(out_dir: str):
    """-> (words, counts, bins) if a sidecar exists AND matches the
    manifest checksum, else None."""
    path = os.path.join(out_dir, TABLE_SIDECAR)
    if not os.path.exists(path):
        return None
    try:
        with open(os.path.join(out_dir, MANIFEST)) as f:
            manifest = json.load(f)
        z = np.load(path)
        words, counts, bins = z["words"], z["counts"], z["bins"]
    except Exception:
        return None
    if table_checksum(words, counts) != manifest.get("checksum"):
        return None
    return words, counts, bins


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
    """Persist partial tables so a job can resume mid-file.

    Two flows share the cursor file (the cursor is authoritative; stray
    part files past it are ignored, so a crash between a part write and the
    cursor rename is harmless):

    * per-batch (``save_batch``): one npz per batch index — the host-merge
      path, where every batch's compacted table visits the host anyway.
    * spill-based (``save_spills``): device-accumulator paths checkpoint at
      MERGE boundaries by forcing a spill (table pull + device reset) every
      ``interval`` batches and persisting the new spill parts + the batch
      cursor.  Resume preloads the spills into ``host_spills`` and skips
      the covered batches — exact by construction, since spilled parts are
      merged by the same weighted group-by as live ones.  On a multi-host
      mesh each process owns its own directory (spills are process-local).
    """

    def __init__(self, ckpt_dir: str, interval: int = 32):
        self.dir = ckpt_dir
        self.interval = interval
        os.makedirs(ckpt_dir, exist_ok=True)
        self.cursor_path = os.path.join(ckpt_dir, "cursor.json")

    def _cursor(self) -> dict:
        if not os.path.exists(self.cursor_path):
            return {"completed": 0, "spills": 0}
        with open(self.cursor_path) as f:
            cur = json.load(f)
        cur.setdefault("spills", 0)
        return cur

    def _write_cursor(self, cur: dict) -> None:
        tmp = self.cursor_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(cur, f)
        os.replace(tmp, self.cursor_path)  # atomic cursor update

    def completed_batches(self) -> int:
        return self._cursor()["completed"]

    def save_batch(self, index: int, words, counts, bins) -> None:
        np.savez(
            os.path.join(self.dir, f"part{index:06d}.npz"),
            words=words, counts=counts, bins=bins,
        )
        self._write_cursor({"completed": index + 1, "spills": 0})

    def save_spills(self, completed: int, parts: list, first_seq: int) -> None:
        """Persist ``parts`` as spill files ``first_seq..`` and advance the
        cursor to ``completed`` batches."""
        for i, (words, counts, bins) in enumerate(parts):
            np.savez(
                os.path.join(self.dir, f"spill{first_seq + i:06d}.npz"),
                words=words, counts=counts, bins=bins,
            )
        self._write_cursor({"completed": completed, "spills": first_seq + len(parts)})

    def load_parts(self) -> list:
        cur = self._cursor()
        if cur["spills"]:
            names = [f"spill{i:06d}.npz" for i in range(cur["spills"])]
        else:
            names = [f"part{i:06d}.npz" for i in range(cur["completed"])]
        parts = []
        for name in names:
            z = np.load(os.path.join(self.dir, name))
            parts.append((z["words"], z["counts"], z["bins"]))
        return parts

    def clear(self) -> None:
        for f in os.listdir(self.dir):
            os.remove(os.path.join(self.dir, f))
