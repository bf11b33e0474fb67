"""Loss registry + Criteria aggregator (reference: pointcept/models/losses/builder.py:13-31)."""

from ao_tpu.utils.registry import Registry

LOSSES = Registry("losses")


class Criteria:
    """Sums the configured losses; called as criteria(pred, target, mask)."""

    def __init__(self, cfg=None):
        self.cfg = cfg if cfg is not None else []
        self.criteria = [LOSSES.build(c) for c in self.cfg]

    def __call__(self, pred, target, mask=None):
        if len(self.criteria) == 0:
            return pred
        loss = 0.0
        for crit in self.criteria:
            loss = loss + crit(pred, target, mask)
        return loss


def build_criteria(cfg):
    return Criteria(cfg)
