"""Scalar metric-path predictor: LinkPredictor over a ScalarSpG.

Same engine, different join: `gather_join_scalar` pairs float structural
scores instead of encoding-table indices (reference train.py:39-43,
encode=None branch).
"""

from __future__ import annotations

from surel_plus_tpu.ops.encoders import ScalarSpG, gather_join_scalar
from surel_plus_tpu.train.loop import LinkPredictor, TrainConfig


class ScalarLinkPredictor(LinkPredictor):
    def __init__(self, model, sspg: ScalarSpG, config: TrainConfig,
                 feature=None):
        super().__init__(model, sspg, config,
                         join_fn=gather_join_scalar, feature=feature)


def scalar_trainer_from_spg(model, sspg: ScalarSpG, config: TrainConfig,
                            feature=None):
    """Device-resident multi-epoch engine for the metric path: the
    generic DeviceTrainer over the padded ScalarSpG device layout with
    the float-pair join — one XLA program per inter-eval epoch block /
    per scored split, same as the LP keys engine (Table 5's PPR+Mean /
    SPD+Mean ablation rows at device-engine rates, main.py:181-202)."""
    from surel_plus_tpu.train.device import DeviceTrainer

    return DeviceTrainer(model, sspg.device(), config,
                         join_fn=gather_join_scalar, feature=feature)
