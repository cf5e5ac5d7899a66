"""Data layer tests: PFM codec, corpus indexers, pipeline invariants."""

import os

import numpy as np
import pytest
from lwsnet_tpu.data.png import write_png

from lwsnet_tpu.data import (DEFAULT_VAL_FRAMES, StereoIndex, StereoPipeline,
                             index_kitti2015, index_sceneflow, read_pfm,
                             write_pfm)
from lwsnet_tpu.data import transforms as T


def test_pfm_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.standard_normal((7, 11)).astype(np.float32)
    p = str(tmp_path / "x.pfm")
    write_pfm(p, data)
    back, scale = read_pfm(p)
    np.testing.assert_array_equal(back, data)
    assert scale == 1.0

    color = rng.standard_normal((5, 6, 3)).astype(np.float32)
    p2 = str(tmp_path / "c.pfm")
    write_pfm(p2, color, scale=2.5)
    back, scale = read_pfm(p2)
    np.testing.assert_array_equal(back, color)
    assert scale == 2.5


def _make_kitti_tree(root, n=200):
    for sub in ("image_2", "image_3", "disp_occ_0"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
        for i in range(n):
            open(os.path.join(root, sub, f"{i:06d}_10.png"), "w").close()
            # non-_10 frames must be ignored (reference: kitti2015load.py:12)
            open(os.path.join(root, sub, f"{i:06d}_11.png"), "w").close()


def test_kitti_index_default_split(tmp_path):
    _make_kitti_tree(str(tmp_path))
    train, val = index_kitti2015(str(tmp_path))
    assert len(val) == 40 and len(train) == 160
    assert len(set(val.left) & set(train.left)) == 0
    # fixed published split (reference: val_set.txt)
    assert os.path.basename(val.left[0]) == "000013_10.png"
    assert all("_10.png" in p for p in train.left)


def test_kitti_index_split_file(tmp_path):
    _make_kitti_tree(str(tmp_path))
    sf = tmp_path / "split.txt"
    sf.write_text("\n".join(str(i) for i in range(10)))
    train, val = index_kitti2015(str(tmp_path), split_file=str(sf))
    assert len(val) == 10 and len(train) == 190


def _make_sceneflow_tree(root):
    def touch(p):
        os.makedirs(os.path.dirname(p), exist_ok=True)
        open(p, "w").close()

    for scene in ("a_scene",):
        for side in ("left", "right"):
            touch(f"{root}/monkaa_frames_cleanpass/{scene}/{side}/0001.png")
        touch(f"{root}/monkaa_disparity/{scene}/left/0001.pfm")
    for split in ("TRAIN", "TEST"):
        for sub in ("A",):
            for side in ("left", "right"):
                touch(f"{root}/frames_cleanpass/{split}/{sub}/0000/{side}/0006.png")
            touch(f"{root}/frames_disparity/{split}/{sub}/0000/left/0006.pfm")
    for focal in ("15mm_focallength", "35mm_focallength"):
        for d in ("scene_backwards", "scene_forwards"):
            for speed in ("fast", "slow"):
                for side in ("left", "right"):
                    touch(f"{root}/driving_frames_cleanpass/{focal}/{d}/{speed}/{side}/0001.png")
                touch(f"{root}/driving_disparity/{focal}/{d}/{speed}/left/0001.pfm")


def test_sceneflow_index(tmp_path):
    _make_sceneflow_tree(str(tmp_path))
    train, test = index_sceneflow(str(tmp_path))
    # monkaa 1 + flying TRAIN 1 + driving 2 focals * 2 dirs * 2 speeds = 10
    assert len(train) == 10
    assert len(test) == 1
    assert all(p.endswith(".pfm") for p in train.disp)
    assert len(train.left) == len(train.right) == len(train.disp)


def test_sceneflow_compat_duplicates_15mm(tmp_path):
    """compat flag reproduces the reference corpus quirk
    (reference: dataloader/sceneflow.py:105)."""
    _make_sceneflow_tree(str(tmp_path))
    train, _ = index_sceneflow(str(tmp_path), compat_duplicate_15mm=True)
    n15 = sum("15mm" in p for p in train.left)
    n35 = sum("35mm" in p for p in train.left)
    assert n15 == 8 and n35 == 0  # 15mm indexed twice, 35mm never


def _write_stereo_example(root, name, h, w, disp_val=20.0):
    rng = np.random.default_rng(hash(name) % 2 ** 31)
    for sub in ("image_2", "image_3"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
        arr = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        write_png(os.path.join(root, sub, name), arr.astype(np.uint8))
    os.makedirs(os.path.join(root, "disp_occ_0"), exist_ok=True)
    d16 = np.full((h, w), int(disp_val * 256), dtype=np.uint16)
    write_png(os.path.join(root, "disp_occ_0", name), d16)


@pytest.fixture(scope="module")
def kitti_mini(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("kitti"))
    for i in range(6):
        _write_stereo_example(root, f"{i:06d}_10.png", 48, 96)
    return root


def test_pipeline_train_batches(kitti_mini):
    idx = StereoIndex(
        left=sorted(os.path.join(kitti_mini, "image_2", f) for f in
                    os.listdir(os.path.join(kitti_mini, "image_2"))),
        right=sorted(os.path.join(kitti_mini, "image_3", f) for f in
                     os.listdir(os.path.join(kitti_mini, "image_3"))),
        disp=sorted(os.path.join(kitti_mini, "disp_occ_0", f) for f in
                    os.listdir(os.path.join(kitti_mini, "disp_occ_0"))),
    )
    pipe = StereoPipeline(idx, batch_size=4, training=True, crop=(32, 64),
                          kitti=True, seed=1)
    batches = list(pipe.epoch(0))
    assert len(batches) == 1  # 6 examples, drop ragged trailing batch
    b = batches[0]
    assert b.left.shape == (4, 32, 64, 3)
    assert b.disparity.shape == (4, 32, 64)
    assert b.valid.sum() == 4
    np.testing.assert_allclose(b.disparity, 20.0)

    # determinism: same epoch -> identical batches
    again = list(pipe.epoch(0))[0]
    np.testing.assert_array_equal(b.left, again.left)
    # different epoch -> different crops/shuffle
    other = list(pipe.epoch(1))[0]
    assert not np.array_equal(b.left, other.left)


def test_pipeline_eval_pads_last_batch(kitti_mini):
    idx = StereoIndex(
        left=sorted(os.path.join(kitti_mini, "image_2", f) for f in
                    os.listdir(os.path.join(kitti_mini, "image_2"))),
        right=sorted(os.path.join(kitti_mini, "image_3", f) for f in
                     os.listdir(os.path.join(kitti_mini, "image_3"))),
        disp=sorted(os.path.join(kitti_mini, "disp_occ_0", f) for f in
                    os.listdir(os.path.join(kitti_mini, "disp_occ_0"))),
    )
    pipe = StereoPipeline(idx, batch_size=4, training=False, crop=(48, 96),
                          kitti=True)
    batches = list(pipe.epoch(0))
    assert len(batches) == 2
    assert batches[1].valid.tolist() == [1.0, 1.0, 0.0, 0.0]
    assert batches[1].left.shape == (4, 48, 96, 3)


def test_pipeline_host_sharding_disjoint(kitti_mini):
    idx = StereoIndex(
        left=sorted(os.path.join(kitti_mini, "image_2", f) for f in
                    os.listdir(os.path.join(kitti_mini, "image_2"))),
        right=sorted(os.path.join(kitti_mini, "image_3", f) for f in
                     os.listdir(os.path.join(kitti_mini, "image_3"))),
        disp=sorted(os.path.join(kitti_mini, "disp_occ_0", f) for f in
                    os.listdir(os.path.join(kitti_mini, "disp_occ_0"))),
    )
    seen = []
    for pi in range(2):
        pipe = StereoPipeline(idx, batch_size=1, training=True, crop=(32, 64),
                              kitti=True, seed=3, process_index=pi,
                              process_count=2)
        seen.append(set(map(tuple, pipe._epoch_order(0).reshape(-1, 1))))
    assert seen[0].isdisjoint(seen[1])
    assert len(seen[0] | seen[1]) == 6


def _mini_index(root):
    return StereoIndex(
        left=sorted(os.path.join(root, "image_2", f) for f in
                    os.listdir(os.path.join(root, "image_2"))),
        right=sorted(os.path.join(root, "image_3", f) for f in
                     os.listdir(os.path.join(root, "image_3"))),
        disp=sorted(os.path.join(root, "disp_occ_0", f) for f in
                    os.listdir(os.path.join(root, "disp_occ_0"))),
    )


@pytest.mark.parametrize("training,bs", [(False, 4), (True, 2), (False, 2)])
def test_pipeline_lockstep_batch_count_across_hosts(kitti_mini, training, bs):
    """Every simulated host must run the SAME number of batches (a host with
    one extra jitted collective step deadlocks the mesh). 6 examples over 4
    hosts gives ragged local slices (2,2,1,1) — the regression case."""
    idx = _mini_index(kitti_mini)
    counts, reported, total_valid = [], [], 0.0
    for pi in range(4):
        pipe = StereoPipeline(idx, batch_size=bs, training=training,
                              crop=(32, 64), kitti=True, seed=5,
                              process_index=pi, process_count=4)
        batches = list(pipe.epoch(0))
        counts.append(len(batches))
        reported.append(pipe.batches_per_epoch())
        total_valid += sum(float(b.valid.sum()) for b in batches)
        for b in batches:  # static shapes even on all-padding batches
            assert b.left.shape == (bs, 32, 64, 3)
    assert len(set(counts)) == 1, counts
    assert counts == reported
    if not training:
        assert total_valid == 6.0  # eval covers every example exactly once


def test_pipeline_eval_more_hosts_than_examples(kitti_mini):
    """n < process_count: slice-empty hosts still emit all-padding batches."""
    idx = _mini_index(kitti_mini)
    counts = []
    for pi in range(8):
        pipe = StereoPipeline(idx, batch_size=2, training=False,
                              crop=(32, 64), kitti=True,
                              process_index=pi, process_count=8)
        batches = list(pipe.epoch(0))
        counts.append(len(batches))
        if pi >= 6:  # empty slice -> padding-only batch, valid all zero
            assert all(float(b.valid.sum()) == 0.0 for b in batches)
    assert len(set(counts)) == 1 and counts[0] == 1


def test_crops_and_normalize():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (10, 12, 3)).astype(np.float32)
    out = T.bottom_right_crop(img, 4, 6)
    np.testing.assert_array_equal(out, img[6:, 6:])
    with pytest.raises(ValueError):
        T.bottom_right_crop(img, 20, 6)
    n = T.normalize(img)
    np.testing.assert_allclose(
        n, (img - T.IMAGENET_MEAN) / T.IMAGENET_STD, atol=1e-6)
