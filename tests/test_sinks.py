"""Metric sinks: TB event files written when tensorboardX is present,
wandb degrades to a no-op, multiplexer fan-out."""

import glob
import os

from lseg_tpu.utils.sinks import (
    MetricSinks,
    TensorBoardSink,
    WandbSink,
    make_sinks,
)


def test_tensorboard_sink_writes_events(tmp_path):
    tb = TensorBoardSink(str(tmp_path))
    assert tb.active  # tensorboardX is in the image
    tb.scalars(0, {"loss": 1.0})
    tb.scalars(1, {"loss": 0.5, "val_miou": 0.1})
    tb.close()
    assert glob.glob(os.path.join(str(tmp_path), "events.out.tfevents*"))


def test_wandb_sink_noop_without_wandb(tmp_path):
    wb = WandbSink("proj", "exp", str(tmp_path))
    # wandb is absent in this image -> inert, and safe to call
    assert not wb.active
    wb.scalars(0, {"loss": 1.0})
    wb.close()


def test_make_sinks_and_multiplex(tmp_path):
    sinks = make_sinks(str(tmp_path), exp_name="t")
    sinks.scalars(3, {"loss": 0.25})
    sinks.close()
    assert glob.glob(os.path.join(str(tmp_path), "tb",
                                  "events.out.tfevents*"))

    class Rec:
        def __init__(self):
            self.rows = []

        def scalars(self, step, m):
            self.rows.append((step, dict(m)))

        def close(self):
            pass

    a, b = Rec(), Rec()
    mux = MetricSinks([a, b])
    mux.scalars(1, {"x": 2.0})
    assert a.rows == b.rows == [(1, {"x": 2.0})]
