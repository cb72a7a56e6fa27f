"""Detection visualization (reference ``lib/utils/visualization.py:~1-80``):
PIL box drawing with the STANDARD_COLORS palette, used by tools/demo.py and
ground-truth image summaries."""

from __future__ import annotations

import numpy as np

STANDARD_COLORS = [
    "AliceBlue", "Chartreuse", "Aqua", "Aquamarine", "Azure", "Beige",
    "Bisque", "BlanchedAlmond", "BlueViolet", "BurlyWood", "CadetBlue",
    "AntiqueWhite", "Chocolate", "Coral", "CornflowerBlue", "Cornsilk",
    "Crimson", "Cyan", "DarkCyan", "DarkGoldenRod", "DarkGrey", "DarkKhaki",
    "DarkOrange", "DarkOrchid", "DarkSalmon", "DarkSeaGreen", "DarkTurquoise",
    "DarkViolet", "DeepPink", "DeepSkyBlue", "DodgerBlue", "FireBrick",
    "FloralWhite", "ForestGreen", "Fuchsia", "Gainsboro", "GhostWhite",
    "Gold", "GoldenRod", "Salmon", "Tan", "HoneyDew", "HotPink", "IndianRed",
]

_FONT = None


def _font():
    global _FONT
    if _FONT is None:
        from PIL import ImageFont

        _FONT = ImageFont.load_default()
    return _FONT


def draw_bounding_boxes(image, boxes, labels=None, scores=None,
                        class_names=None, thickness: int = 2):
    """Draw boxes on an image.

    image: (H, W, 3) uint8 RGB array; boxes: (N, 4) [x1, y1, x2, y2];
    labels: (N,) int class ids; scores: (N,) floats.
    Returns a new (H, W, 3) uint8 array.
    """
    from PIL import Image, ImageDraw

    pil = Image.fromarray(image.astype(np.uint8))
    draw = ImageDraw.Draw(pil)
    for i, box in enumerate(np.asarray(boxes)):
        cls = int(labels[i]) if labels is not None else 0
        color = STANDARD_COLORS[cls % len(STANDARD_COLORS)]
        x1, y1, x2, y2 = [float(v) for v in box[:4]]
        draw.rectangle([x1, y1, x2, y2], outline=color, width=thickness)
        text = ""
        if class_names is not None and labels is not None:
            text = class_names[cls]
        if scores is not None:
            text = f"{text} {float(scores[i]):.2f}".strip()
        if text:
            draw.text((x1 + 2, max(0.0, y1 - 12)), text, fill=color, font=_font())
    return np.asarray(pil)
