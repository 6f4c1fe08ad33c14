# tudl PBR+real mixed training (2:1) — the working version of the
# reference's broken r50_tudl_mixpbr.py (SURVEY.md §2.2: the shipped mix
# configs reference unregistered types / set a head as detector type).
_base_ = ["./r50_tudl_pbr.py"]

data_root = "data/tudl/"
data = dict(
    train=dict(
        type="MixDataset",
        ratios=[2, 1],
        datasets=[
            dict(
                ann_file=data_root + "detector_annotations/train_pbr.json",
                img_prefix=data_root + "train_pbr/",
                min_visib_frac=0.1,
            ),
            dict(
                ann_file=data_root + "detector_annotations/train_real.json",
                img_prefix=data_root + "train_real/",
                min_visib_frac=0.1,
            ),
        ],
    ),
)
# start from the PBR-trained checkpoint (reference load_from semantics)
load_from = "work_dirs/tudl_r50_radet_pbr/checkpoints"
work_dir = "work_dirs/tudl_r50_radet_mixpbr"
