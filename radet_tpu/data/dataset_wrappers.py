"""Dataset wrappers: Concat / Repeat / Mix / ClassBalanced.

Capability parity with /root/reference/radet/datasets/dataset_wrappers.py:
- ConcatDataset: concatenation with global index mapping;
- RepeatDataset: index-modulo repetition (:130-168);
- MixDataset: ratio-weighted concat of repeated datasets — the reference's
  PBR+real mixing mechanism (:171-180); NB the three reference *_mixpbr
  configs are unbuildable as shipped (SURVEY.md §7 'known quirks'); our
  configs/bop/*_mixpbr.py use this wrapper correctly;
- ClassBalancedDataset: LVIS-style sqrt-inverse-frequency oversampling
  (:187-297).

All wrappers forward the attributes the loader/apis need (CLASSES, cat_ids,
coco, det2json, ...) from the first underlying dataset.
"""

from __future__ import annotations

import bisect
import math
from collections import defaultdict
from typing import List, Sequence


class _ForwardingMixin:
    _primary_attr = "datasets"

    def _primary(self):
        d = getattr(self, self._primary_attr)
        return d[0] if isinstance(d, (list, tuple)) else d

    def __getattr__(self, name):
        if name.startswith("_"):
            raise AttributeError(name)
        return getattr(self._primary(), name)


class ConcatDataset(_ForwardingMixin):
    def __init__(self, datasets: Sequence):
        assert len(datasets) > 0
        self.datasets = list(datasets)
        self.cumulative_sizes = []
        total = 0
        for d in self.datasets:
            total += len(d)
            self.cumulative_sizes.append(total)
        self.CLASSES = getattr(self.datasets[0], "CLASSES", None)

    def __len__(self):
        return self.cumulative_sizes[-1]

    def __getitem__(self, idx):
        ds_idx = bisect.bisect_right(self.cumulative_sizes, idx)
        prev = 0 if ds_idx == 0 else self.cumulative_sizes[ds_idx - 1]
        return self.datasets[ds_idx][idx - prev]


class RepeatDataset(_ForwardingMixin):
    _primary_attr = "dataset"

    def __init__(self, dataset, times: int):
        self.dataset = dataset
        self.times = times
        self._ori_len = len(dataset)
        self.CLASSES = getattr(dataset, "CLASSES", None)

    def __len__(self):
        return self.times * self._ori_len

    def __getitem__(self, idx):
        return self.dataset[idx % self._ori_len]


class MixDataset(ConcatDataset):
    """Ratio-weighted mix of datasets (e.g. PBR + real)."""

    def __init__(self, datasets: Sequence, ratios: Sequence[int]):
        assert len(datasets) == len(ratios)
        super().__init__([RepeatDataset(d, r) for d, r in zip(datasets, ratios)])


class ClassBalancedDataset(_ForwardingMixin):
    _primary_attr = "dataset"

    def __init__(self, dataset, oversample_thr: float, filter_empty_gt: bool = True):
        self.dataset = dataset
        self.oversample_thr = oversample_thr
        self.filter_empty_gt = filter_empty_gt
        self.CLASSES = getattr(dataset, "CLASSES", None)

        repeat_factors = self._get_repeat_factors(dataset, oversample_thr)
        self.repeat_indices: List[int] = []
        for idx, rf in enumerate(repeat_factors):
            self.repeat_indices.extend([idx] * int(math.ceil(rf)))

    def _image_cat_ids(self, dataset, idx):
        if hasattr(dataset, "get_cat_ids"):
            return set(dataset.get_cat_ids(idx))
        # BOPDataset path: derive from annotations
        info = dataset.data_infos[idx]
        return {
            a["category_id"]
            for a in dataset.coco.get_anns(info["id"])
            if a["category_id"] in dataset.cat2label
        }

    def _get_repeat_factors(self, dataset, thr):
        n = len(dataset)
        cat_freq = defaultdict(float)
        img_cats = []
        # reference semantics (dataset_wrappers.py:261,280): with
        # filter_empty_gt=False, empty-GT images act as a pseudo-category so
        # their rarity also drives oversampling
        empty_cat = len(self.CLASSES) if self.CLASSES is not None else -1
        for idx in range(n):
            cats = self._image_cat_ids(dataset, idx)
            if not cats and not self.filter_empty_gt:
                cats = {empty_cat}
            img_cats.append(cats)
            for c in cats:
                cat_freq[c] += 1.0
        for c in cat_freq:
            cat_freq[c] /= n
        cat_repeat = {
            c: max(1.0, math.sqrt(thr / f)) for c, f in cat_freq.items() if f > 0
        }
        return [
            max({cat_repeat[c] for c in cats}, default=1.0) for cats in img_cats
        ]

    def __len__(self):
        return len(self.repeat_indices)

    def __getitem__(self, idx):
        return self.dataset[self.repeat_indices[idx]]
