"""Dataset factory (reference ``lib/datasets/factory.py:~1-60``, SURVEY.md
#24): name → imdb registry for the VOC and COCO splits the reference knows."""

from __future__ import annotations

__sets = {}


def _register():
    from frcnn_tpu.data.pascal_voc import pascal_voc

    for year in ("2007", "2012"):
        for split in ("train", "val", "trainval", "test"):
            name = f"voc_{year}_{split}"
            __sets[name] = (lambda dd, split=split, year=year:
                            pascal_voc(split, year, data_dir=dd))
            __sets[name + "_diff"] = (lambda dd, split=split, year=year:
                                      pascal_voc(split, year, use_diff=True,
                                                 data_dir=dd))

    from frcnn_tpu.data.coco import coco

    for year in ("2014",):
        for split in ("train", "val", "minival", "valminusminival"):
            name = f"coco_{year}_{split}"
            __sets[name] = (lambda dd, split=split, year=year:
                            coco(split, year, data_dir=dd))
    for year in ("2015",):
        for split in ("test", "test-dev"):
            name = f"coco_{year}_{split}"
            __sets[name] = (lambda dd, split=split, year=year:
                            coco(split, year, data_dir=dd))


def get_imdb(name: str, data_dir: str | None = None):
    """Get an imdb by name (raises KeyError with the known list otherwise).

    ``data_dir`` overrides the module-default ``cfg.DATA_DIR`` — CLI
    ``--set DATA_DIR`` must reach the dataset (the reference's mutable
    global cfg did this implicitly; our immutable config threads it)."""
    if not __sets:
        _register()
    if name not in __sets:
        raise KeyError(f"unknown dataset: {name}; known: {sorted(__sets)}")
    return __sets[name](data_dir)


def list_imdbs():
    if not __sets:
        _register()
    return sorted(__sets.keys())
