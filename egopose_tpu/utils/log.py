"""Text + scalar logging (mirrors /root/reference/utils/logger.py and the
TF1 summary writer in utils/tb_logger.py, without the TF dependency).

Scalars are written as TensorBoard-compatible event files when
tensorboard's pure-python writer is importable, with a JSONL fallback.
"""
from __future__ import annotations

import json
import logging
import os
import time


def create_logger(filename=None, file_handle=True):
    logger = logging.getLogger("egopose_tpu")
    logger.handlers.clear()
    logger.setLevel(logging.DEBUG)
    fmt = logging.Formatter("%(asctime)s %(message)s", "%m-%d %H:%M:%S")
    sh = logging.StreamHandler()
    sh.setLevel(logging.INFO)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if filename and file_handle:
        os.makedirs(os.path.dirname(filename), exist_ok=True)
        fh = logging.FileHandler(filename)
        fh.setLevel(logging.DEBUG)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


def to_uint8_image(img, scale=None):
    """Convert an image array to uint8 for summary encoding.  uint8 passes
    through; floats are mapped by ``scale``: "unit" ([0,1] x 255, the
    default) or "byte" ([0,255] clipped).  The scale is a fixed convention,
    never inferred from the data (ADVICE r2: a data-max heuristic brightens
    a near-black byte-range frame 255x)."""
    import numpy as np
    img = np.asarray(img)
    if img.dtype == np.uint8:
        return img
    img = np.nan_to_num(np.asarray(img, np.float64))
    if scale is None:
        scale = "unit"
    if scale == "byte":
        img = np.clip(img, 0.0, 255.0)
    elif scale == "unit":
        img = np.clip(img, 0.0, 1.0) * 255.0
    else:
        raise ValueError(f"unknown image scale {scale!r} (unit|byte|None)")
    return img.astype(np.uint8)


class ScalarWriter:
    """Scalar summaries: tensorboard event file if available, else JSONL."""

    def __init__(self, logdir):
        os.makedirs(logdir, exist_ok=True)
        self._tb = None
        try:
            from tensorboard.summary.writer.event_file_writer import EventFileWriter
            from tensorboard.compat.proto.summary_pb2 import Summary
            from tensorboard.compat.proto.event_pb2 import Event
            self._tb = EventFileWriter(logdir)
            self._Summary, self._Event = Summary, Event
        except Exception:
            self._jsonl = open(os.path.join(logdir, "scalars.jsonl"), "a")

    def scalar(self, tag, value, step):
        if self._tb is not None:
            s = self._Summary(value=[self._Summary.Value(tag=tag,
                                                         simple_value=float(value))])
            self._tb.add_event(self._Event(summary=s, step=step,
                                           wall_time=time.time()))
        else:
            self._jsonl.write(json.dumps({"tag": tag, "value": float(value),
                                          "step": step, "ts": time.time()}) + "\n")
            self._jsonl.flush()

    def image(self, tag, img, step, scale=None):
        """Image summary (reference utils/tb_logger.py:44-67): ``img`` is an
        (H,W,3) uint8 array, or float with ``scale`` naming the authored
        range -- "unit" ([0,1], multiplied by 255) or "byte" ([0,255],
        clipped).  ``scale=None`` means "unit": float images are taken to be
        [0,1] by fixed convention, never inferred from the data max (a
        data-max heuristic brightens a near-black [0,255]-scale frame 255x;
        ADVICE r2).  Pass ``scale="byte"`` for [0,255] floats.  Values are
        clipped either way so out-of-range floats cannot wrap in the uint8
        cast.  JSONL fallback records shape only."""
        img = to_uint8_image(img, scale)
        if self._tb is not None:
            import io
            from PIL import Image
            buf = io.BytesIO()
            Image.fromarray(img).save(buf, format="PNG")
            im = self._Summary.Image(height=img.shape[0], width=img.shape[1],
                                     colorspace=img.shape[-1],
                                     encoded_image_string=buf.getvalue())
            s = self._Summary(value=[self._Summary.Value(tag=tag, image=im)])
            self._tb.add_event(self._Event(summary=s, step=step,
                                           wall_time=time.time()))
        else:
            self._jsonl.write(json.dumps(
                {"tag": tag, "image_shape": list(img.shape),
                 "step": step, "ts": time.time()}) + "\n")
            self._jsonl.flush()

    def histogram(self, tag, values, step, bins=64):
        """Histogram summary (reference utils/tb_logger.py:69-96).  Empty or
        all-non-finite input is a no-op (a logging call must never kill the
        training loop)."""
        import numpy as np
        values = np.asarray(values, np.float64).ravel()
        values = values[np.isfinite(values)]
        if values.size == 0:
            return
        counts, edges = np.histogram(values, bins=bins)
        if self._tb is not None:
            from tensorboard.compat.proto.summary_pb2 import HistogramProto
            h = HistogramProto(
                min=float(values.min()), max=float(values.max()),
                num=int(values.size), sum=float(values.sum()),
                sum_squares=float((values ** 2).sum()),
                bucket_limit=edges[1:].tolist(),
                bucket=counts.tolist())
            s = self._Summary(value=[self._Summary.Value(tag=tag, histo=h)])
            self._tb.add_event(self._Event(summary=s, step=step,
                                           wall_time=time.time()))
        else:
            self._jsonl.write(json.dumps(
                {"tag": tag, "histogram": {"counts": counts.tolist(),
                                           "edges": edges.tolist()},
                 "step": step, "ts": time.time()}) + "\n")
            self._jsonl.flush()

    def flush(self):
        if self._tb is not None:
            self._tb.flush()
