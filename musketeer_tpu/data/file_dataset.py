"""TSV dataset reader with per-host sharding and epoch-stable slicing.

TPU-native replacement for the reference's FileDataset (ref:
data/file_dataset.py:11-109). Differences, by design:

- the reference shards rows by GPU rank with a sequential readline cursor
  (stateful, fragile resume via ``_seek``); here a byte-offset index is built
  once (cached alongside the file as ``<file>.idx.npy``) and rows are random
  access — epoch resume is just an integer, and shuffling is an index
  permutation instead of file order,
- sharding is by JAX process (host), not device: one host feeds all its
  local devices one global array slice (single-controller model),
- ``row_count`` remains mutable to support Musketeer's equal-sampling
  truncation semantics (ref: data/mm_data/musketeer_data.py:184-220).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np


class FileDataset:
    def __init__(
        self,
        file_path: str,
        selected_col_ids: Optional[Sequence[int]] = None,
        dtypes=None,
        separator: str = "\t",
        cached_index: bool = True,
        shard_id: int = 0,
        num_shards: int = 1,
    ):
        assert os.path.exists(file_path), f"Error: The local datafile {file_path} not exists!"
        self.file_path = file_path
        self.separator = separator
        self.selected_col_ids = (
            list(selected_col_ids) if selected_col_ids is not None else None
        )
        self.shard_id = shard_id
        self.num_shards = num_shards

        self._offsets = self._build_or_load_index(cached_index)
        self.total_row_count = len(self._offsets)
        # rank slice: rows [shard_id::num_shards] (ref slices contiguous
        # blocks; strided slicing balances shard sizes to ±1 row)
        self._shard_rows = np.arange(shard_id, self.total_row_count, num_shards)
        self.row_count = len(self._shard_rows)  # mutable (eq-sampling truncation)
        self._fh = None
        self._native = None  # lazy NativeTsv for batched reads

    def _build_or_load_index(self, cached: bool) -> np.ndarray:
        idx_path = self.file_path + ".idx.npy"
        if cached and os.path.exists(idx_path) and os.path.getmtime(
            idx_path
        ) >= os.path.getmtime(self.file_path):
            return np.load(idx_path)
        arr = self._native_index()
        if arr is None:
            offsets: List[int] = []
            pos = 0
            with open(self.file_path, "rb") as f:
                for line in f:
                    offsets.append(pos)
                    pos += len(line)
            arr = np.asarray(offsets, np.int64)
        if cached:
            try:
                np.save(idx_path, arr)
            except OSError:
                pass  # read-only data dir; index rebuilt next time
        return arr

    def _native_index(self) -> Optional[np.ndarray]:
        """mmap newline scan via the C++ library (~20x the Python pass)."""
        try:
            from ..native import NativeTsv, available

            if not available():
                return None
            nt = NativeTsv(self.file_path)
            offsets = nt.offsets()
            nt.close()
            return offsets
        except Exception:
            return None

    def __len__(self) -> int:
        return self.row_count

    def _file(self):
        if self._fh is None:
            self._fh = open(self.file_path, "rb")
        return self._fh

    def __getitem__(self, index: int) -> List[str]:
        row = self._shard_rows[index % self.row_count]
        f = self._file()
        f.seek(self._offsets[row])
        line = f.readline().decode("utf-8").rstrip("\n")
        cols = line.split(self.separator)
        if self.selected_col_ids is not None:
            cols = [cols[i] for i in self.selected_col_ids]
        return cols

    def get_batch(self, indices: Sequence[int]) -> List[List[str]]:
        """Batched fetch: one native C call for all rows (falls back to the
        per-row Python path). Indices are shard-local, like ``__getitem__``."""
        rows = self._shard_rows[np.asarray(indices, np.int64) % self.row_count]
        lines = self._native_rows(rows)
        if lines is None:
            return [self[int(i)] for i in indices]
        out = []
        for line in lines:
            cols = line.rstrip("\r\n").split(self.separator)
            if self.selected_col_ids is not None:
                cols = [cols[i] for i in self.selected_col_ids]
            out.append(cols)
        return out

    def _native_rows(self, rows: np.ndarray) -> Optional[List[str]]:
        if self._native is False:
            return None
        try:
            if self._native is None:
                from ..native import NativeTsv, available

                if not available():
                    self._native = False
                    return None
                self._native = NativeTsv(self.file_path)
            return self._native.rows(rows)
        except Exception:
            self._native = False
            return None

    def __getstate__(self):
        state = self.__dict__.copy()
        state["_fh"] = None  # file handles don't pickle (dataloader workers)
        state["_native"] = None  # native handles don't pickle either
        return state
