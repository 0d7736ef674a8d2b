"""Minimal bed_reader shim so the reference PyRHE can run in this
environment (the real bed_reader wheel is not installed here).

Implements exactly the surface the reference uses (reference
pyrhe/src/base/base.py:10,100,213,341-343):

    from bed_reader import open_bed
    bed = open_bed(path + ".bed")
    bed.read()                                  # full (N, M) float32
    bed.read(index=np.s_[::1, start:end])       # (N, m) SNP-column slice

Returns A1 allele counts with NaN for missing, matching bed_reader's
count_A1=True default (the reference then flips 0<->2 itself,
base.py:347-355). Decoding is delegated to pyrhe_tpu's native .bed
decoder, which emits A2 counts with 255 for missing — hence the 2-x
remap below.
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
from pyrhe_tpu.io.bed import BedFile  # noqa: E402


def _count_lines(path: str) -> int:
    with open(path, "rb") as f:
        return sum(1 for _ in f)


class open_bed:
    def __init__(self, filepath, **_ignored):
        filepath = str(filepath)
        prefix = filepath[:-4] if filepath.endswith(".bed") else filepath
        self.iid_count = _count_lines(prefix + ".fam")
        self.sid_count = _count_lines(prefix + ".bim")
        self._bed = BedFile(prefix + ".bed", self.iid_count, self.sid_count)

    def read(self, index=None, dtype="float32", **_ignored):
        if index is None:
            start, end = 0, self.sid_count
        else:
            rows, cols = index
            if (rows.start, rows.stop) != (None, None) or rows.step not in (
                    None, 1):
                raise NotImplementedError("shim supports full-row reads only")
            start = 0 if cols.start is None else cols.start
            end = self.sid_count if cols.stop is None else cols.stop
        a2 = self._bed.read_block(start, end)      # (m, N) u8, 255 missing
        out = (2.0 - a2.T).astype(dtype)           # A1 count, (N, m)
        out[a2.T == 255] = np.nan
        return out
