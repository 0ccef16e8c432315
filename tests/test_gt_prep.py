"""GT preparation (tools/prepare_gt_labels.py): polygon JSON -> trainId
label/instance rasters, pinned to cityscapesScripts semantics
(json2labelImg.py:50-110, json2instanceImg.py:84-155)."""

import json
import os
import sys

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

import prepare_gt_labels as gtp  # noqa: E402


def _ann(objects, w=64, h=48):
    return {"imgWidth": w, "imgHeight": h, "objects": objects}


def _rect(x0, y0, x1, y1):
    return [[x0, y0], [x1, y0], [x1, y1], [x0, y1]]


def test_label_image_draw_order_and_background():
    # later polygons win; background is the unlabeled value (255 trainIds)
    ann = _ann([
        {"label": "road", "polygon": _rect(0, 0, 63, 47)},
        {"label": "car", "polygon": _rect(10, 10, 20, 20)},
    ])
    img = np.array(gtp.create_label_image(ann, "trainIds"))
    assert img[0, 0] == 0            # road trainId
    assert img[15, 15] == 13         # car trainId overdraws road
    ids = np.array(gtp.create_label_image(ann, "ids"))
    assert ids[15, 15] == 26         # car raw id
    empty = np.array(gtp.create_label_image(_ann([]), "trainIds"))
    assert (empty == 255).all()      # unlabeled trainId background
    empty_ids = np.array(gtp.create_label_image(_ann([]), "ids"))
    assert (empty_ids == 0).all()    # unlabeled raw id background


def test_deleted_objects_skipped():
    ann = _ann([
        {"label": "car", "polygon": _rect(5, 5, 30, 30), "deleted": 1},
    ])
    img = np.array(gtp.create_label_image(ann, "trainIds"))
    assert (img == 255).all()


def test_group_suffix_resolution():
    # 'cargroup' is not a label name; resolves to 'car' and in the INSTANCE
    # image keeps the plain class id (no *1000 numbering)
    ann = _ann([
        {"label": "cargroup", "polygon": _rect(0, 0, 63, 47)},
        {"label": "car", "polygon": _rect(10, 10, 20, 20)},
    ])
    lab = np.array(gtp.create_label_image(ann, "trainIds"))
    assert lab[0, 0] == 13 and lab[15, 15] == 13
    inst = np.array(gtp.create_instance_image(ann, "trainIds"))
    assert inst[0, 0] == 13          # group: plain class id
    assert inst[15, 15] == 13000     # first real car instance
    with pytest.raises(KeyError):
        gtp.create_label_image(_ann([
            {"label": "spaceship", "polygon": _rect(0, 0, 5, 5)}]))


def test_instance_numbering_per_class():
    ann = _ann([
        {"label": "car", "polygon": _rect(0, 0, 10, 10)},
        {"label": "person", "polygon": _rect(20, 0, 30, 10)},
        {"label": "car", "polygon": _rect(40, 0, 50, 10)},
        {"label": "sky", "polygon": _rect(0, 30, 63, 47)},
    ])
    inst = np.array(gtp.create_instance_image(ann, "trainIds"))
    assert inst[5, 5] == 13000       # car #0
    assert inst[5, 25] == 11000      # person #0 (independent counter)
    assert inst[5, 45] == 13001      # car #1
    assert inst[40, 10] == 10        # stuff keeps the plain trainId
    # raw-id encoding numbers from the raw class ids
    inst_ids = np.array(gtp.create_instance_image(ann, "ids"))
    assert inst_ids[5, 5] == 26000 and inst_ids[5, 45] == 26001


def test_ignore_and_negative_classes():
    # caravan has trainId 255 (ignore): stays un-numbered in trainIds
    # encoding but IS numbered under raw ids (id 29 != 255);
    # license plate (id -1) is never drawn
    ann = _ann([
        {"label": "caravan", "polygon": _rect(0, 0, 10, 10)},
        {"label": "license plate", "polygon": _rect(20, 0, 30, 10)},
    ])
    inst = np.array(gtp.create_instance_image(ann, "trainIds"))
    assert inst[5, 5] == 255
    assert inst[5, 25] == 255        # untouched background
    lab = np.array(gtp.create_label_image(ann, "ids"))
    assert lab[5, 25] == 0           # license plate not drawn
    inst_ids = np.array(gtp.create_instance_image(ann, "ids"))
    assert inst_ids[5, 5] == 29000


def test_batch_driver_writes_siblings(tmp_path):
    city_dir = tmp_path / "gtFine" / "train" / "syntown"
    city_dir.mkdir(parents=True)
    ann = _ann([{"label": "car", "polygon": _rect(4, 4, 20, 20)}])
    jpath = city_dir / "syntown_000000_000019_gtFine_polygons.json"
    jpath.write_text(json.dumps(ann))
    n = gtp.prepare(str(tmp_path), verbose=False)
    assert n == 1
    lab = np.array(Image.open(
        str(jpath).replace("_polygons.json", "_labelTrainIds.png")))
    inst = np.array(Image.open(
        str(jpath).replace("_polygons.json", "_instanceTrainIds.png")))
    assert lab.shape == (48, 64) and lab[10, 10] == 13
    # PNG carries mode-"I" as 16-bit grayscale; ids <= 18999 are lossless
    # (same as real Cityscapes instance pngs)
    assert inst[10, 10] == 13000 and inst.dtype in (np.uint16, np.int32)
