"""Test configuration.

Tests run on CPU with a virtual 8-device platform so that sharding /
collective code paths compile and execute without TPU hardware (the stand-in
for multi-chip, per SURVEY.md §4).  Must set env vars before jax imports.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config API works.
# FRCNN_TPU_TEST_TPU=1 keeps the real backend so the TPU-gated compiled-kernel
# tests (skipped on CPU) can run on a chip.  Select single tests — every
# distinct kernel shape is a separate (minutes-long, tunneled) compile:
#   FRCNN_TPU_TEST_TPU=1 pytest tests/test_pallas_kernels.py -k roi_align_pallas_matches
if not os.environ.get("FRCNN_TPU_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")
    # Persistent XLA compile cache for the CPU suite: the tier's cost is
    # compile-dominated (the two train-parity graphs alone are ~45 s each
    # on this 1-core box), and the cache is keyed by HLO hash, so any
    # source change that alters a graph recompiles exactly that graph.
    # Cold run ≈ warm run + ~4-5 min of compiles; tests/README.md records
    # both.  Kept separate from the TPU cache (~/.cache/frcnn_tpu_xla).
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/frcnn_tpu_xla_cpu_tests"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """Default tier = everything except `nightly` (tests/README.md).

    Implemented as a hook rather than `addopts = "-m 'not nightly'"` so that
    selecting a test by explicit node id always runs it — the addopts form
    silently collected 0 tests for e.g.
    `pytest tests/test_ap_regression.py::test_trained_ap_floor` (ADVICE r3).
    Any explicit -m (including `-m ""` = run everything) overrides this.
    """
    inv = config.invocation_params.args
    if any(a == "-m" or a.startswith(("-m=", "--markexpr")) for a in inv):
        return
    if any("::" in a for a in config.args):
        return
    deselect = [it for it in items if it.get_closest_marker("nightly")]
    if deselect:
        items[:] = [it for it in items if not it.get_closest_marker("nightly")]
        config.hook.pytest_deselected(items=deselect)


@pytest.fixture
def rng():
    return np.random.RandomState(3)  # cfg.RNG_SEED


VOC_CLASSES_USED = ["dog", "cat", "car"]


@pytest.fixture(scope="session")
def voc_root(tmp_path_factory):
    """Synthetic VOCdevkit2007 with 6 images and simple box annotations."""
    import cv2

    root = tmp_path_factory.mktemp("data")
    devkit = root / "VOCdevkit2007"
    d = devkit / "VOC2007"
    (d / "Annotations").mkdir(parents=True)
    (d / "ImageSets" / "Main").mkdir(parents=True)
    (d / "JPEGImages").mkdir(parents=True)

    rng = np.random.RandomState(0)
    index = []
    gt = {}
    for i in range(6):
        name = f"{i:06d}"
        index.append(name)
        h, w = rng.choice([240, 320]), rng.choice([320, 400])
        im = rng.randint(0, 255, (h, w, 3), np.uint8)
        boxes = []
        for j in range(rng.randint(1, 4)):
            x1 = rng.randint(0, w - 60)
            y1 = rng.randint(0, h - 60)
            x2 = x1 + rng.randint(30, 59)
            y2 = y1 + rng.randint(30, 59)
            cls = VOC_CLASSES_USED[rng.randint(0, 3)]
            diff = 1 if (i == 0 and j == 0) else 0
            boxes.append((cls, x1, y1, x2, y2, diff))
            im[y1:y2, x1:x2] = rng.randint(0, 255, 3)
        cv2.imwrite(str(d / "JPEGImages" / f"{name}.jpg"), im)
        gt[name] = boxes
        objs = "".join(
            f"""  <object><name>{c}</name><pose>Left</pose><truncated>0</truncated>
    <difficult>{df}</difficult>
    <bndbox><xmin>{x1+1}</xmin><ymin>{y1+1}</ymin><xmax>{x2+1}</xmax><ymax>{y2+1}</ymax></bndbox>
  </object>\n""" for c, x1, y1, x2, y2, df in boxes)
        (d / "Annotations" / f"{name}.xml").write_text(
            f"""<annotation><folder>VOC2007</folder><filename>{name}.jpg</filename>
<size><width>{w}</width><height>{h}</height><depth>3</depth></size>
{objs}</annotation>""")
    for split in ("trainval", "test"):
        (d / "ImageSets" / "Main" / f"{split}.txt").write_text("\n".join(index) + "\n")
    return str(root), gt


@pytest.fixture(scope="session")
def voc_learnable_root(tmp_path_factory):
    """Learnable synthetic VOCdevkit2007 via tools/make_synthetic_voc.py:
    class-correlated colors, trainval 12 / test 4.  Used by the trained-AP
    regression (the `voc_root` fixture's boxes have random colors — nothing
    to learn)."""
    import subprocess
    import sys

    root = str(tmp_path_factory.mktemp("voc_learnable"))
    subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(__file__), "..", "tools",
                      "make_synthetic_voc.py"),
         "--root", root, "--images", "16", "--seed", "0",
         "--classes", "dog", "cat", "car"],
        check=True, capture_output=True)
    return root


def make_voc(voc_root, split="test"):
    """pascal_voc instance over the synthetic devkit with redirected cache."""
    import os
    import os.path as osp
    from frcnn_tpu.data.pascal_voc import pascal_voc

    root, gt = voc_root
    # data_dir redirects cache_path per-instance (a class-level monkeypatch
    # here used to leak the last caller's cache dir to later instances)
    ds = pascal_voc(split, "2007", devkit_path=osp.join(root, "VOCdevkit2007"),
                    data_dir=root)
    os.makedirs(osp.join(root, "cache"), exist_ok=True)
    return ds, gt


def random_boxes(rng, n, width=800, height=600, min_size=2.0):
    """Random well-formed inclusive-corner boxes."""
    x1 = rng.uniform(0, width - min_size - 1, n)
    y1 = rng.uniform(0, height - min_size - 1, n)
    w = rng.uniform(min_size, width / 2, n)
    h = rng.uniform(min_size, height / 2, n)
    x2 = np.minimum(x1 + w, width - 1)
    y2 = np.minimum(y1 + h, height - 1)
    return np.stack([x1, y1, x2, y2], axis=1).astype(np.float32)


COCO_CATS = [{"id": 1, "name": "dog"}, {"id": 5, "name": "cat"},
             {"id": 9, "name": "car"}]  # non-contiguous ids like real COCO


@pytest.fixture(scope="session")
def coco_root(tmp_path_factory):
    """Synthetic COCO train2014: 6 images, 3 categories, instances json."""
    import json
    import os.path as osp

    import cv2

    root = str(tmp_path_factory.mktemp("coco_data"))
    img_dir = osp.join(root, "images", "train2014")
    ann_dir = osp.join(root, "annotations")
    os.makedirs(img_dir)
    os.makedirs(ann_dir)

    rng = np.random.RandomState(7)
    images, anns = [], []
    aid = 1
    for i in range(6):
        h, w = int(rng.choice([240, 320])), int(rng.choice([320, 400]))
        im = rng.randint(0, 255, (h, w, 3)).astype(np.uint8)
        fname = f"COCO_train2014_{i:012d}.jpg"
        for _ in range(rng.randint(1, 4)):
            x = int(rng.randint(0, w - 60))
            y = int(rng.randint(0, h - 60))
            bw, bh = int(rng.randint(30, 59)), int(rng.randint(30, 59))
            im[y:y + bh, x:x + bw] = rng.randint(0, 255, 3)
            cat = COCO_CATS[rng.randint(0, 3)]
            anns.append({"id": aid, "image_id": i, "category_id": cat["id"],
                         "bbox": [x, y, bw, bh], "area": bw * bh,
                         "iscrowd": 0})
            aid += 1
        cv2.imwrite(osp.join(img_dir, fname), im)
        images.append({"id": i, "file_name": fname, "width": w, "height": h})
    with open(osp.join(ann_dir, "instances_train2014.json"), "w") as f:
        json.dump({"images": images, "annotations": anns,
                   "categories": COCO_CATS}, f)
    return root


def make_coco(coco_root):
    """coco imdb over the synthetic dataset with redirected cache."""
    import os.path as osp

    from frcnn_tpu.data.coco import coco

    ds = coco("train", "2014", data_path=coco_root, data_dir=coco_root)
    os.makedirs(osp.join(coco_root, "cache"), exist_ok=True)
    return ds
