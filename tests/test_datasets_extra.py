"""Dataset-zoo tests: XML/VOC layout, class presets, protocol delegation.

Covers radet_tpu/data/datasets_extra.py against the reference semantics in
datasets/{xml_style,voc,wider_face,ycbv,kitti,lvis}.py.
"""

import os
import os.path as osp

import numpy as np
import pytest

from radet_tpu.data import (
    BOPDataset,
    CocoDataset,
    KittiDataset,
    LVISV1Dataset,
    VOCDataset,
    WIDERFaceDataset,
    YcbvDataset,
)

TEST_PIPELINE = [
    dict(type="LoadImageFromFile"),
    dict(type="Resize", img_scale=(64, 48), keep_ratio=True),
    dict(type="Pad", size_divisor=16),
]

TRAIN_PIPELINE = [
    dict(type="LoadImageFromFile"),
    dict(type="LoadAnnotations", with_bbox=True),
    dict(type="Resize", img_scale=(64, 48), keep_ratio=True),
    dict(type="GenerateDistanceMap", with_gt_mask=False),
    dict(type="SampleDistanceAtAnchors"),
    dict(type="Pad", size_divisor=16),
]


def _voc_xml(img_id, size, objects):
    obj_xml = "".join(
        f"""
  <object>
    <name>{name}</name>
    <difficult>{diff}</difficult>
    <bndbox><xmin>{b[0]}</xmin><ymin>{b[1]}</ymin><xmax>{b[2]}</xmax><ymax>{b[3]}</ymax></bndbox>
  </object>"""
        for name, diff, b in objects
    )
    return f"""<annotation>
  <folder>events</folder>
  <filename>{img_id}.jpg</filename>
  <size><width>{size[1]}</width><height>{size[0]}</height><depth>3</depth></size>{obj_xml}
</annotation>"""


@pytest.fixture(scope="module")
def voc_root(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("voc") / "VOC2007"
    for sub in ("Annotations", "JPEGImages", "ImageSets/Main"):
        os.makedirs(root / sub, exist_ok=True)
    rng = np.random.RandomState(0)
    # VOC coordinates are 1-based (xml_style.py:132-139)
    scenes = {
        "000001": [("dog", 0, (11, 11, 41, 41)), ("person", 1, (5, 5, 25, 30))],
        "000002": [("car", 0, (2, 3, 50, 40)), ("bicycle", 0, (20, 8, 60, 44))],
    }
    for img_id in scenes:
        img = rng.randint(0, 255, (48, 64, 3), np.uint8)
        cv2.imwrite(str(root / "JPEGImages" / f"{img_id}.jpg"), img)
        with open(root / "Annotations" / f"{img_id}.xml", "w") as f:
            f.write(_voc_xml(img_id, (48, 64), scenes[img_id]))
    list_file = root / "ImageSets" / "Main" / "test.txt"
    with open(list_file, "w") as f:
        f.write("\n".join(scenes) + "\n")
    return str(root), str(list_file)


def _make_voc(voc_root, pipeline, test_mode):
    root, list_file = voc_root
    return VOCDataset(
        ann_file=list_file,
        img_prefix=root,
        pipeline=pipeline,
        test_mode=test_mode,
        input_size=(48, 64),
        max_gt=8,
    )


def test_voc_ann_parsing(voc_root):
    ds = _make_voc(voc_root, TEST_PIPELINE, test_mode=True)
    assert ds.year == 2007
    assert len(ds) == 2 and len(ds.CLASSES) == 20
    ann = ds.get_ann_info(0)
    # the non-difficult dog: 1-based XML coords shift by -1
    np.testing.assert_allclose(ann["bboxes"], [[10, 10, 40, 40]])
    assert ann["labels"].tolist() == [ds.CLASSES.index("dog")]
    # the difficult person lands in the ignore set with its label
    np.testing.assert_allclose(ann["bboxes_ignore"], [[4, 4, 24, 29]])
    assert ann["labels_ignore"].tolist() == [ds.CLASSES.index("person")]


def test_voc_min_size_ignore(voc_root):
    root, list_file = voc_root
    ds = VOCDataset(
        ann_file=list_file,
        img_prefix=root,
        min_size=20,
        input_size=(48, 64),
        test_mode=True,
    )
    ann = ds.get_ann_info(0)
    # the 30x30 dog survives; nothing extra ignored beyond the difficult one
    assert len(ann["bboxes"]) == 1
    ann2 = ds.get_ann_info(1)
    assert len(ann2["bboxes"]) == 2  # both >= 20px


def test_voc_year_inference(voc_root, tmp_path):
    root, list_file = voc_root
    # alias the tree through a symlink so the prefix no longer contains
    # VOC2007/VOC2012 — year inference must fail loudly (reference voc.py:24)
    alias = tmp_path / "plain"
    os.symlink(root, alias)
    with pytest.raises(ValueError, match="year"):
        VOCDataset(
            ann_file=list_file,
            img_prefix=str(alias),
            input_size=(48, 64),
            test_mode=True,
        )


def test_voc_test_sample_shapes(voc_root):
    ds = _make_voc(voc_root, TEST_PIPELINE, test_mode=True)
    s = ds[0]
    assert s["image"].shape == (48, 64, 3)


def test_voc_train_sample_no_masks(voc_root):
    """The XML path has no masks: GenerateDistanceMap must take the no-mask
    MBD/GDT route (reference radet_transforms.py bbox2distance fallback)."""
    ds = _make_voc(voc_root, TRAIN_PIPELINE, test_mode=False)
    s = ds[0]
    assert s["gt_boxes"].shape == (8, 4)
    assert s["dist_vals"].shape[1] == 8
    g = int(s["gt_valid"].sum())
    assert g >= 1
    assert s["dist_vals"][:, :g].max() > 0


def _perfect_results(ds):
    out = []
    for i, img_id in enumerate(ds.img_ids):
        ann = ds.get_ann_info(i)
        out.append(
            dict(
                img_id=img_id,
                boxes=ann["bboxes"],
                scores=np.full(len(ann["bboxes"]), 0.9, np.float32),
                labels=ann["labels"],
            )
        )
    return out


def test_voc_evaluate_perfect_map(voc_root):
    ds = _make_voc(voc_root, TEST_PIPELINE, test_mode=True)
    metrics = ds.evaluate(_perfect_results(ds))
    assert metrics["mAP"] == pytest.approx(1.0)
    assert metrics["AP50"] == pytest.approx(1.0)


def test_voc_evaluate_detects_misses(voc_root):
    ds = _make_voc(voc_root, TEST_PIPELINE, test_mode=True)
    results = _perfect_results(ds)
    results[1]["boxes"] = results[1]["boxes"] + 30.0  # shift off target
    metrics = ds.evaluate(results)
    assert metrics["mAP"] < 1.0


def test_voc_evaluate_recall(voc_root):
    ds = _make_voc(voc_root, TEST_PIPELINE, test_mode=True)
    metrics = ds.evaluate(
        _perfect_results(ds), metric="recall", proposal_nums=(1, 10)
    )
    assert metrics["recall@10@0.5"] == pytest.approx(1.0)


def test_evaluate_results_delegates_to_voc(voc_root):
    from radet_tpu.apis.test import evaluate_results

    ds = _make_voc(voc_root, TEST_PIPELINE, test_mode=True)
    metrics = evaluate_results(ds, _perfect_results(ds))
    assert metrics["mAP"] == pytest.approx(1.0)


def test_all_difficult_image_filtered_in_training(tmp_path):
    """An image whose objects are all difficult has no trainable gt and is
    dropped by the empty-gt filter up front (instead of resampling forever)."""
    import cv2

    root = tmp_path / "VOC2007"
    for sub in ("Annotations", "JPEGImages", "ImageSets/Main"):
        os.makedirs(root / sub, exist_ok=True)
    scenes = {
        "000001": [("dog", 1, (11, 11, 41, 41))],  # all difficult
        "000002": [("car", 0, (2, 3, 50, 40))],
    }
    rng = np.random.RandomState(0)
    for img_id, objs in scenes.items():
        cv2.imwrite(
            str(root / "JPEGImages" / f"{img_id}.jpg"),
            rng.randint(0, 255, (48, 64, 3), np.uint8),
        )
        with open(root / "Annotations" / f"{img_id}.xml", "w") as f:
            f.write(_voc_xml(img_id, (48, 64), objs))
    lf = root / "ImageSets/Main/train.txt"
    open(lf, "w").write("\n".join(scenes) + "\n")
    ds = VOCDataset(
        ann_file=str(lf), img_prefix=str(root), pipeline=TRAIN_PIPELINE,
        test_mode=False, input_size=(48, 64), max_gt=8,
    )
    assert len(ds) == 1
    assert ds.data_infos[0]["voc_id"] == "000002"


def test_widerface_folder_filenames(tmp_path):
    os.makedirs(tmp_path / "Annotations")
    with open(tmp_path / "Annotations" / "0_Parade_1.xml", "w") as f:
        f.write(
            _voc_xml("0_Parade_1", (48, 64), [("face", 0, (5, 5, 25, 25))])
        )
    with open(tmp_path / "list.txt", "w") as f:
        f.write("0_Parade_1\n")
    ds = WIDERFaceDataset(
        ann_file=str(tmp_path / "list.txt"),
        img_prefix=str(tmp_path),
        input_size=(48, 64),
        test_mode=True,
    )
    assert ds.data_infos[0]["filename"] == "events/0_Parade_1.jpg"
    assert ds.CLASSES == ["face"]


def _coco_dict(class_names, num_images=1):
    return dict(
        images=[
            dict(id=i + 1, filename=f"img{i}.png", width=64, height=48)
            for i in range(num_images)
        ],
        annotations=[
            dict(
                id=1,
                image_id=1,
                category_id=1,
                bbox=[4.0, 4.0, 20.0, 20.0],
                area=400.0,
                iscrowd=0,
            )
        ],
        categories=[dict(id=i + 1, name=n) for i, n in enumerate(class_names)],
    )


def test_preset_classes_datasets():
    ycbv = YcbvDataset(_coco_dict(YcbvDataset.CLASSES), test_mode=True)
    assert len(ycbv.CLASSES) == 21 and ycbv.CLASSES[0] == "master_chef_can"
    coco = CocoDataset(_coco_dict(CocoDataset.CLASSES), test_mode=True)
    assert len(coco.CLASSES) == 80
    kitti = KittiDataset(_coco_dict(KittiDataset.CLASSES), test_mode=True)
    assert kitti.EVAL_DEFAULTS == dict(classwise=True)
    # explicit classes subset still narrows the preset
    sub = YcbvDataset(
        _coco_dict(YcbvDataset.CLASSES), classes=["banana", "mug"], test_mode=True
    )
    assert sub.CLASSES == ["banana", "mug"]


def test_kitti_eval_forces_classwise():
    from radet_tpu.apis.test import evaluate_results

    ds = KittiDataset(_coco_dict(KittiDataset.CLASSES), test_mode=True)
    results = [
        dict(
            img_id=1,
            boxes=np.array([[4.0, 4.0, 24.0, 24.0]], np.float32),
            scores=np.array([0.9], np.float32),
            labels=np.array([0], np.int64),
        )
    ]
    metrics = evaluate_results(ds, results)
    assert metrics["bbox_mAP"] == pytest.approx(1.0)
    assert "bbox_AP_Car" in metrics  # classwise forced by EVAL_DEFAULTS


def test_lvis_coco_url_filenames():
    d = _coco_dict(["tin_can"])
    for img in d["images"]:
        del img["filename"]
        img["coco_url"] = "http://images.cocodataset.org/val2017/000000397133.jpg"
    ds = LVISV1Dataset(d, test_mode=True)
    assert ds.data_infos[0]["filename"] == "val2017/000000397133.jpg"
    assert ds.CLASSES == ["tin_can"]


def test_build_dataset_voc_type(voc_root):
    from radet_tpu.apis.common import build_dataset
    from radet_tpu.utils.config import Config

    root, list_file = voc_root
    cfg = Config(
        dict(
            input_size=(48, 64),
            model=dict(
                backbone=dict(type="ResNet", depth=18),
                bbox_head=dict(
                    num_classes=20,
                    anchor_generator=dict(
                        octave_base_scale=8,
                        strides=[8, 16],
                        regress_ranges=[(-1, 64), (64, 1e8)],
                    ),
                ),
            ),
            data=dict(
                test=dict(
                    type="VOCDataset",
                    ann_file=list_file,
                    img_prefix=root,
                    pipeline=TEST_PIPELINE,
                )
            ),
        )
    )
    ds = build_dataset(cfg, "test")
    assert isinstance(ds, VOCDataset) and len(ds) == 2


def test_build_dataset_unknown_type_fails(voc_root):
    from radet_tpu.apis.common import build_dataset
    from radet_tpu.utils.config import Config

    root, list_file = voc_root
    cfg = Config(
        dict(
            input_size=(48, 64),
            model=dict(
                backbone=dict(type="ResNet", depth=18),
                bbox_head=dict(num_classes=1, anchor_generator=dict()),
            ),
            data=dict(
                test=dict(type="NopeDataset", ann_file=list_file, pipeline=[])
            ),
        )
    )
    with pytest.raises(KeyError, match="NopeDataset"):
        build_dataset(cfg, "test")
