"""BDE repository walker: dataset discovery, ordering, pruning, and the
completeness gate.

Layout (reference README.md:159-162; t/linz_bde_uploader.t:484-485):

    <repo>/level_0/<YYYYMMDDhhmmss>/<file>.crs[.gz]
    <repo>/level_5/<YYYYMMDDhhmmss>/<file>.crs[.gz]

Datasets order lexicographically by directory name
(lib/LINZ/BdeUpload.pm:621,689). Operators:

- S1 dataset scan        lib/LINZ/BdeUpload.pm:620-629,661-687
- S2 time filter         :621,685-687 (-before / watermark)
- S3 completeness gate   :84-92,204-214,633-643,691-702
- O2 latest selection    :629,687

These are driver-side listings (tiny metadata), which at cluster scale
become partition pruning: only pruned dataset directories are ever
passed to ``spark.read``.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass

_DATASET_RE = re.compile(r"^\d{14}$")


@dataclass
class Dataset:
    level: int  # 0 or 5
    name: str   # YYYYMMDDhhmmss
    path: str

    def files(self) -> dict[str, str]:
        """Map file tag (basename without .crs[.gz]) -> full path."""
        out = {}
        for f in sorted(os.listdir(self.path)):
            if f.endswith(".crs"):
                out[f[:-4]] = os.path.join(self.path, f)
            elif f.endswith(".crs.gz"):
                out[f[:-7]] = os.path.join(self.path, f)
        return out

    def has_files(self, tags: list[str]) -> bool:
        """S3: completeness — every expected file tag present."""
        have = set(self.files())
        return all(t in have for t in tags)

    def missing_files(self, tags: list[str]) -> list[str]:
        have = set(self.files())
        return [t for t in tags if t not in have]


class BdeRepository:
    def __init__(self, root: str):
        self.root = root

    def _level_dir(self, level: int) -> str:
        return os.path.join(self.root, f"level_{level}")

    def datasets(self, level: int) -> list[Dataset]:
        """S1: ordered dataset list for a level."""
        d = self._level_dir(level)
        if not os.path.isdir(d):
            return []
        names = sorted(n for n in os.listdir(d)
                       if _DATASET_RE.match(n) and os.path.isdir(os.path.join(d, n)))
        return [Dataset(level, n, os.path.join(d, n)) for n in names]

    def select(self, level: int, after: str | None = None,
               before: str | None = None) -> list[Dataset]:
        """S2: watermark/time pruning — keep name > after and
        name < before (both exclusive, matching `lt`/`after()` at
        lib/LINZ/BdeUpload.pm:621,685-687)."""
        out = self.datasets(level)
        if after is not None:
            out = [ds for ds in out if ds.name > after]
        if before is not None:
            out = [ds for ds in out if ds.name < before]
        return out

    def latest(self, level: int, before: str | None = None) -> Dataset | None:
        """O2: `-full` loads only the newest level-0 dataset."""
        sel = self.select(level, before=before)
        return sel[-1] if sel else None


def dataset_timestamp(name: str) -> str:
    """VARCHAR(14) wall-clock stamp -> ISO timestamp string
    (substr parse at sql/02-bde_control_functions.sql.in:2895-2904)."""
    if not _DATASET_RE.match(name):
        raise ValueError(f"bad dataset name {name!r}")
    return (f"{name[0:4]}-{name[4:6]}-{name[6:8]} "
            f"{name[8:10]}:{name[10:12]}:{name[12:14]}")
