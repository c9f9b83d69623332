"""save_video writes a real, re-readable mp4 (reference: inference/render.py:74-88
writes mp4 videos; this env has no ffmpeg binary, so the writer rides OpenCV's
bundled mp4v codec). Fast tier — no model, no raster."""

import numpy as np


def test_save_video_mp4_roundtrip(tmp_path):
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parents[1]))
    from render import save_video

    frames = [np.full((48, 64, 3), i * 10, np.uint8) for i in range(7)]
    out = save_video(str(tmp_path / "clip"), frames, fps=12)
    assert out.endswith(".mp4"), out

    import cv2

    cap = cv2.VideoCapture(out)
    n, last = 0, None
    while True:
        ok, f = cap.read()
        if not ok:
            break
        n, last = n + 1, f
    assert n == 7, n
    # mp4v is lossy; check the ramp survived approximately (frame i ~= i*10).
    assert abs(float(last.mean()) - 60.0) < 8.0
