"""SceneFlow corpus indexing (reference: dataloader/sceneflow.py:37-122).

Walks the monkaa / FlyingThings-style / driving subsets of a SceneFlow root:

  <root>/
    monkaa_frames_cleanpass/<scene>/{left,right}/*.png
    monkaa_disparity/<scene>/left/*.pfm
    frames_cleanpass/{TRAIN,TEST}/{A,B,C}/<seq>/{left,right}/*.png
    frames_disparity/{TRAIN,TEST}/{A,B,C}/<seq>/left/*.pfm
    driving_frames_cleanpass/<focal>/<dir>/<speed>/{left,right}/*.png
    driving_disparity/...

The reference indexes the driving 15mm focal-length split twice and never the
35mm one (reference: dataloader/sceneflow.py:105). That corpus is
reproducible with `compat_duplicate_15mm=True`; the default fixes it to
[15mm, 35mm].
"""

from __future__ import annotations

import os
from typing import List, Tuple

from lwsnet_tpu.data.kitti2015 import StereoIndex

_IMG_EXTS = (".jpg", ".jpeg", ".png", ".ppm", ".bmp")


def _is_image(name: str) -> bool:
    return name.lower().endswith(_IMG_EXTS)


def _ls(path: str) -> List[str]:
    return sorted(os.listdir(path))


def index_sceneflow(root: str,
                    compat_duplicate_15mm: bool = False
                    ) -> Tuple[StereoIndex, StereoIndex]:
    """Index a SceneFlow root into (train, test) StereoIndex triplets."""
    root = root.rstrip("/") + "/"
    entries = [d for d in _ls(root) if os.path.isdir(root + d)]
    image_dirs = [d for d in entries if "frames_cleanpass" in d]
    disp_dirs = [d for d in entries if "disparity" in d]

    tr_l: List[str] = []
    tr_r: List[str] = []
    tr_d: List[str] = []
    te_l: List[str] = []
    te_r: List[str] = []
    te_d: List[str] = []

    def add(dst_l, dst_r, dst_d, img_dir, disp_dir):
        left_dir = os.path.join(img_dir, "left")
        right_dir = os.path.join(img_dir, "right")
        for im in _ls(left_dir):
            if not _is_image(im):
                continue
            stem = im.split(".")[0]
            dst_l.append(os.path.join(left_dir, im))
            dst_r.append(os.path.join(right_dir, im))
            dst_d.append(os.path.join(disp_dir, "left", stem + ".pfm"))

    # monkaa (reference: dataloader/sceneflow.py:43-63)
    monkaa_img = [d for d in image_dirs if "monkaa" in d]
    if monkaa_img:
        mi = root + monkaa_img[0]
        md = root + [d for d in disp_dirs if "monkaa" in d][0]
        for scene in _ls(mi):
            add(tr_l, tr_r, tr_d, os.path.join(mi, scene),
                os.path.join(md, scene))

    # FlyingThings-style TRAIN/TEST A-B-C (reference: dataloader/sceneflow.py:65-100)
    if "frames_cleanpass" in image_dirs:
        fi = root + "frames_cleanpass"
        fd = root + "frames_disparity"
        for split, (dl, dr, dd) in (("TRAIN", (tr_l, tr_r, tr_d)),
                                    ("TEST", (te_l, te_r, te_d))):
            split_dir = os.path.join(fi, split)
            if not os.path.isdir(split_dir):
                continue
            for sub in ("A", "B", "C"):
                sub_dir = os.path.join(split_dir, sub)
                if not os.path.isdir(sub_dir):
                    continue
                for seq in _ls(sub_dir):
                    add(dl, dr, dd, os.path.join(sub_dir, seq),
                        os.path.join(fd, split, sub, seq))

    # driving (reference: dataloader/sceneflow.py:102-120)
    driving_img = [d for d in image_dirs if "driving" in d]
    if driving_img:
        di = root + driving_img[0]
        dd = root + [d for d in disp_dirs if "driving" in d][0]
        if compat_duplicate_15mm:
            focals = ["15mm_focallength", "15mm_focallength"]
        else:
            focals = [f for f in ("15mm_focallength", "35mm_focallength")
                      if os.path.isdir(os.path.join(di, f))]
        for focal in focals:
            for direction in ("scene_backwards", "scene_forwards"):
                for speed in ("fast", "slow"):
                    img_dir = os.path.join(di, focal, direction, speed)
                    if not os.path.isdir(img_dir):
                        continue
                    add(tr_l, tr_r, tr_d, img_dir,
                        os.path.join(dd, focal, direction, speed))

    return (StereoIndex(tr_l, tr_r, tr_d), StereoIndex(te_l, te_r, te_d))
