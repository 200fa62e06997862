"""Plain GICP baseline — the EM core with uniform semantic weights.

Reference counterpart: the comparison methods instantiated in the
driver mains (pcl::GeneralizedIterativeClosestPoint; SURVEY.md §2.1 row
"Baseline registrations"). One flag, not a second implementation —
serves as the ablation for the paper's semantic-weighting claim and as
a correctness cross-check.
"""

from __future__ import annotations

import dataclasses

from semicp.cloud.cloud import Cloud
from semicp.config import Config
from semicp.register.em_icp import AlignResult, align


def align_gicp(src: Cloud, tgt: Cloud, cfg: Config | None = None, T_init=None) -> AlignResult:
    cfg = cfg or Config()
    cfg = dataclasses.replace(cfg, em=dataclasses.replace(cfg.em, uniform_semantics=True))
    return align(src, tgt, cfg, T_init)
