"""KITTI-360 -> cityscapes-trainId conversion (tools/kitti2cityscapes_semantic).

Pins the reference driver's semantics (src/kitti2cityscapes_semantic.py:
118-149): the extended id table, the thing-instance renumbering with the
semantic-id modulo divisor, the bare-trainId write for non-things, and the
dropped-first-dir output layout.
"""

import numpy as np
import pytest

from c2m_tpu.data.labels import (KITTI360_ID_TO_TRAINID,
                                 kitti360_id_to_trainid)
from tools.kitti2cityscapes_semantic import convert_pair, convert_tree


def test_kitti360_table_extends_cityscapes():
    # standard ids keep their cityscapes trainIds
    assert KITTI360_ID_TO_TRAINID[7] == 0        # road
    assert KITTI360_ID_TO_TRAINID[26] == 13      # car
    assert KITTI360_ID_TO_TRAINID[33] == 18      # bicycle
    # KITTI-360 extras (reference table lines 103-112)
    assert KITTI360_ID_TO_TRAINID[34] == 2       # garage -> building
    assert KITTI360_ID_TO_TRAINID[35] == 4       # gate -> fence
    assert KITTI360_ID_TO_TRAINID[37] == 5       # smallpole -> pole
    for lid in (36, 38, 39, 40, 41, 42, 43, 44):
        assert KITTI360_ID_TO_TRAINID[lid] == 255
    arr = kitti360_id_to_trainid(np.array([7, 34, 37, 44], np.uint8))
    np.testing.assert_array_equal(arr, [0, 2, 5, 255])


def test_convert_pair_reference_loop_equivalence():
    """Vectorized convert == the reference's per-label mask loop."""
    rng = np.random.RandomState(0)
    sem = rng.choice([0, 5, 7, 24, 26, 31, 34, 37, 44], size=(13, 17))
    sem = sem.astype(np.uint8)
    inst = (sem.astype(np.int64) * 1000
            + rng.randint(0, 9, size=sem.shape)).astype(np.int32)

    new_sem, new_inst = convert_pair(sem, inst)

    # reference loop, transcribed semantics (zeros_like init, per-label
    # masks, thing_list = trainIds 11..18, divisor = id * 1000)
    ref_sem = np.zeros_like(sem)
    ref_inst = np.zeros_like(inst, dtype=np.int32)
    thing_list = list(range(11, 19))
    for lid, tid in KITTI360_ID_TO_TRAINID.items():
        mask = sem == lid
        ref_sem[mask] = tid
        if tid in thing_list and mask.sum() > 0:
            k = inst[mask] % (lid * 1000)
            ref_inst[mask] = tid * 1000 + k
        else:
            ref_inst[mask] = tid
    np.testing.assert_array_equal(new_sem, ref_sem)
    np.testing.assert_array_equal(new_inst, ref_inst)
    # spot values: car id 26 inst 26004 -> 13004; road -> bare 0;
    # garage -> bare 2 (not a thing); unknown object -> 255
    s = np.array([[26, 7], [34, 44]], np.uint8)
    i = np.array([[26004, 7000], [34002, 44001]], np.int32)
    ns, ni = convert_pair(s, i)
    np.testing.assert_array_equal(ns, [[13, 0], [2, 255]])
    np.testing.assert_array_equal(ni, [[13004, 0], [2, 255]])


def test_convert_tree_layout_and_roundtrip(tmp_path):
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    seq = tmp_path / "leftImg8bit_sequence"
    src = seq / "2011_09_26" / "drive_0001" / "image_02" / "semantic"
    src.mkdir(parents=True)
    inst_dir = seq / "2011_09_26" / "drive_0001" / "image_02" / "instance"
    inst_dir.mkdir(parents=True)
    sem = np.array([[24, 34], [7, 44]], np.uint8)
    inst = (sem.astype(np.int64) * 1000 + 3).astype(np.int32)
    Image.fromarray(sem).save(src / "0000000000.png")
    Image.fromarray(inst, mode="I").save(inst_dir / "0000000000.png")

    n = convert_tree(tmp_path, "*/*/*/semantic/*.png")
    assert n == 1
    # first dir under the sequence root is dropped (reference path parity)
    out_sem = (seq / "train_semantic_segmask" / "drive_0001" / "image_02"
               / "image_02" / "data" / "0000000000.png")
    out_inst = (seq / "train_instance" / "drive_0001" / "image_02"
                / "image_02" / "data" / "0000000000.png")
    assert out_sem.is_file() and out_inst.is_file()
    got_sem = np.array(Image.open(out_sem))
    got_inst = np.array(Image.open(out_inst))
    np.testing.assert_array_equal(got_sem, [[11, 2], [0, 255]])
    np.testing.assert_array_equal(got_inst, [[11003, 2], [0, 255]])
