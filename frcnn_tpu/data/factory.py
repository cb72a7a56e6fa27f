"""Dataset factory (reference ``lib/datasets/factory.py:~1-60``, SURVEY.md
#24): name → imdb registry for the VOC and COCO splits the reference knows."""

from __future__ import annotations

__sets = {}


def _register():
    from frcnn_tpu.data.pascal_voc import pascal_voc

    for year in ("2007", "2012"):
        for split in ("train", "val", "trainval", "test"):
            name = f"voc_{year}_{split}"
            __sets[name] = (lambda split=split, year=year:
                            pascal_voc(split, year))
            __sets[name + "_diff"] = (lambda split=split, year=year:
                                      pascal_voc(split, year, use_diff=True))

    from frcnn_tpu.data.coco import coco

    for year in ("2014",):
        for split in ("train", "val", "minival", "valminusminival"):
            name = f"coco_{year}_{split}"
            __sets[name] = (lambda split=split, year=year: coco(split, year))
    for year in ("2015",):
        for split in ("test", "test-dev"):
            name = f"coco_{year}_{split}"
            __sets[name] = (lambda split=split, year=year: coco(split, year))


def get_imdb(name: str):
    """Get an imdb by name (raises KeyError with the known list otherwise)."""
    if not __sets:
        _register()
    if name not in __sets:
        raise KeyError(f"unknown dataset: {name}; known: {sorted(__sets)}")
    return __sets[name]()


def list_imdbs():
    if not __sets:
        _register()
    return sorted(__sets.keys())
