"""YoloNASPANNeckWithC2: 2-up / 2-down PAN over four backbone levels.

Structure from the reference arch YAML (``yolo_heads_l_arch_params.yaml:49-88``)
and the public SuperGradients PAN-with-C2 wiring: the first up stage fuses
(c5, c4, c3), the second fuses (x, c3, c2); the down path mirrors it using the
up stages' pre-upsample intermediates as skips.  Emits (p3, p4, p5) at strides
8 / 16 / 32.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from head_detector_tpu.models.blocks import BlockCfg, YoloNASDownStage, YoloNASUpStage
from head_detector_tpu.models.presets import ArchCfg


class YoloNASPANNeckWithC2(nn.Module):
    arch: ArchCfg
    deploy: bool = False
    cfg: BlockCfg = BlockCfg()

    @nn.compact
    def __call__(
        self, inputs: Sequence[jnp.ndarray], train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        c2, c3, c4, c5 = inputs
        up1, up2 = self.arch.neck_up
        down1, down2 = self.arch.neck_down

        x_n1_inter, x = YoloNASUpStage(
            up1.out_channels,
            up1.num_blocks,
            hidden_channels=up1.hidden_channels,
            width_mult=up1.width_mult,
            depth_mult=up1.depth_mult,
            reduce_channels=up1.reduce_channels,
            deploy=self.deploy,
            cfg=self.cfg,
            name="neck1",
        )([c5, c4, c3], train)

        x_n2_inter, p3 = YoloNASUpStage(
            up2.out_channels,
            up2.num_blocks,
            hidden_channels=up2.hidden_channels,
            width_mult=up2.width_mult,
            depth_mult=up2.depth_mult,
            reduce_channels=up2.reduce_channels,
            deploy=self.deploy,
            cfg=self.cfg,
            name="neck2",
        )([x, c3, c2], train)

        p4 = YoloNASDownStage(
            down1.out_channels,
            down1.num_blocks,
            hidden_channels=down1.hidden_channels,
            width_mult=down1.width_mult,
            depth_mult=down1.depth_mult,
            deploy=self.deploy,
            cfg=self.cfg,
            name="neck3",
        )([p3, x_n2_inter], train)

        p5 = YoloNASDownStage(
            down2.out_channels,
            down2.num_blocks,
            hidden_channels=down2.hidden_channels,
            width_mult=down2.width_mult,
            depth_mult=down2.depth_mult,
            deploy=self.deploy,
            cfg=self.cfg,
            name="neck4",
        )([p4, x_n1_inter], train)

        return p3, p4, p5
