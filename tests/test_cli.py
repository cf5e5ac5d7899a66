"""End-to-end CLI entry-point tests on tiny synthetic corpora.

Drives the actual `main()` of each app — flag parsing, config plumbing,
indexers, pipelines, Trainer/InferenceEngine wiring, artifact writing —
the glue the unit tests can't see (reference entry points: train.py:41,
finetune.py:43, inference.py:31). Geometry is shrunk through the CLI's own
crop/eval-window flags; the corpora reuse the synthetic-PNG recipe of
tests/test_trainer.py.
"""

import os

import numpy as np
import pytest

from lwsnet_tpu.data.pfm import write_pfm
from lwsnet_tpu.data.png import write_png

H, W = 40, 72           # synthetic image size
CROP = ["--crop_height", "32", "--crop_width", "64"]
EVAL = ["--eval_height", "32", "--eval_width", "64"]
FAST = ["--compute_dtype", "float32", "--num_workers", "2"]


def _write_pair(rng, lp, rp, h=H, w=W):
    img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    write_png(lp, img)
    write_png(rp, np.roll(img, -3, axis=1))
    return rng.uniform(3.0, 40.0, (h, w)).astype(np.float32)


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    """KITTI2015 `training/` layout: image_2/image_3/disp_occ_0 with
    *_10.png frames (reference: dataloader/kitti2015load.py:7-12).
    24 frames; a split file marks 8 as validation."""
    root = tmp_path_factory.mktemp("kitti")
    rng = np.random.default_rng(0)
    for d in ("image_2", "image_3", "disp_occ_0"):
        os.makedirs(root / d)
    for i in range(24):
        name = f"{i:06d}_10.png"
        disp = _write_pair(rng, str(root / "image_2" / name),
                           str(root / "image_3" / name))
        # KITTI GT: uint16 = disp * 256 (reference: dataloader.py:54-56)
        write_png(str(root / "disp_occ_0" / name),
                  (disp * 256).astype(np.uint16))
    split = root / "val.txt"
    split.write_text("".join(f"{i}\n" for i in range(8)))
    return str(root), str(split)


@pytest.fixture(scope="module")
def sceneflow_root(tmp_path_factory):
    """SceneFlow layout slice: a monkaa scene (train) + a
    frames_cleanpass/TEST sequence (test), PFM ground truth
    (reference: dataloader/sceneflow.py:43-100).

    Eval geometry contract: the eval window is 4 rows TALLER than the
    images (the reference crops 544 rows from 540-row frames, padding the
    top; GT stays full-size and the metric drops the prediction's top 4
    rows — reference: dataloader/dataloader.py:85, train.py:189). TEST
    frames are therefore eval_height-4 x eval_width = 28x64."""
    root = tmp_path_factory.mktemp("sceneflow")
    rng = np.random.default_rng(1)

    def fill(img_dir, disp_dir, n, h, w):
        for sub in ("left", "right"):
            os.makedirs(os.path.join(img_dir, sub), exist_ok=True)
        os.makedirs(os.path.join(disp_dir, "left"), exist_ok=True)
        for i in range(n):
            disp = _write_pair(
                rng, os.path.join(img_dir, "left", f"{i:04d}.png"),
                os.path.join(img_dir, "right", f"{i:04d}.png"), h, w)
            write_pfm(os.path.join(disp_dir, "left", f"{i:04d}.pfm"), disp)

    fill(str(root / "monkaa_frames_cleanpass" / "sceneA"),
         str(root / "monkaa_disparity" / "sceneA"), 8, H, W)
    fill(str(root / "frames_cleanpass" / "TEST" / "A" / "0000"),
         str(root / "frames_disparity" / "TEST" / "A" / "0000"), 8, 28, 64)
    return str(root)


def test_pretrain_main(sceneflow_root, tmp_path):
    from lwsnet_tpu.cli import pretrain

    save = str(tmp_path / "ckpt")
    err = pretrain.main(
        ["--datapath", sceneflow_root, "--epoch", "1",
         "--train_batch_size", "8", "--test_batch_size", "8",
         "--save_path", save] + CROP + EVAL + FAST)
    assert np.isfinite(err)
    # best-only checkpoint landed (reference: train.py:112-122)
    assert os.path.isdir(save) and os.listdir(save)


def test_finetune_main_and_evaluate(kitti_root, tmp_path):
    from lwsnet_tpu.cli import finetune

    root, split = kitti_root
    save = str(tmp_path / "ckpt")
    common = (["--datapath", root, "--val_set", split, "--pretrained", "",
               "--train_batch_size", "8", "--test_batch_size", "8",
               "--save_path", save] + CROP + EVAL + FAST)
    err = finetune.main(["--epoch", "1"] + common)
    assert np.isfinite(err) and 0.0 <= err <= 1.0  # D1 is a rate
    assert os.path.isdir(save) and os.listdir(save)

    # --evaluate: one validation pass, no training
    # (reference: finetune.py:115-117); resumes the checkpoint just saved.
    err2 = finetune.main(["--evaluate", "--resume"] + common)
    assert np.isfinite(err2)


@pytest.fixture(scope="module")
def testing_root(tmp_path_factory):
    """KITTI `testing/` layout (GT-free) for batch inference."""
    root = tmp_path_factory.mktemp("testing")
    rng = np.random.default_rng(2)
    for d in ("image_2", "image_3"):
        os.makedirs(root / d)
    for i in range(2):
        name = f"{i:06d}_10.png"
        _write_pair(rng, str(root / "image_2" / name),
                    str(root / "image_3" / name))
    return str(root)


def test_infer_main_batch(testing_root, tmp_path):
    from lwsnet_tpu.cli import infer

    out = str(tmp_path / "out")
    infer.main(["--img_path", testing_root, "--save_path", out,
                "--random_weights", "--no_pallas",
                "--compute_dtype", "float32"] + EVAL)
    # all 4 stages saved for every frame (conscious fix of the reference's
    # final-stage-only batch mode, reference: inference.py:134-138)
    for i in range(2):
        for s in range(1, 5):
            assert os.path.isfile(
                os.path.join(out, f"{i:06d}_10_stage{s}.png"))


def test_infer_main_single_pair(testing_root, tmp_path):
    from lwsnet_tpu.cli import infer

    left = os.path.join(testing_root, "image_2", "000000_10.png")
    import shutil
    # single-pair mode expects a sibling right_test.png
    # (reference: inference.py:66-70)
    shutil.copy(os.path.join(testing_root, "image_3", "000000_10.png"),
                os.path.join(testing_root, "image_2", "right_test.png"))
    out = str(tmp_path / "single")
    infer.main(["--left_img", left, "--save_path", out,
                "--random_weights", "--no_pallas",
                "--compute_dtype", "float32"] + EVAL)
    for s in range(1, 5):  # {1..4}.png (reference: inference.py:117-122)
        assert os.path.isfile(os.path.join(out, f"{s}.png"))
