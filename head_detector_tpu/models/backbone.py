"""NStageBackbone: YoloNAS stem + 4 stages + SPP context module.

Structure from the reference arch YAML
(``yolo_heads_l_arch_params.yaml:4-47``): stem -> stage1..4 -> SPP, with
``out_layers: [stage1, stage2, stage3, context_module]`` i.e. the backbone
emits feature maps at strides 4, 8, 16 and 32.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from head_detector_tpu.models.blocks import BlockCfg, SPP, YoloNASStage, YoloNASStem
from head_detector_tpu.models.presets import ArchCfg


class NStageBackbone(nn.Module):
    arch: ArchCfg
    deploy: bool = False
    s2d_stem: bool = False
    cfg: BlockCfg = BlockCfg()

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        x = YoloNASStem(
            self.arch.stem_channels, deploy=self.deploy, s2d=self.s2d_stem,
            cfg=self.cfg, name="stem",
        )(x, train)

        outs = []
        for i, st in enumerate(self.arch.stages):
            x = YoloNASStage(
                st.out_channels,
                st.num_blocks,
                hidden_channels=st.hidden_channels,
                concat_intermediates=st.concat_intermediates,
                deploy=self.deploy,
                cfg=self.cfg,
                name=f"stage{i + 1}",
            )(x, train)
            outs.append(x)

        context = SPP(
            self.arch.spp_channels, k=self.arch.spp_k, cfg=self.cfg,
            name="context_module",
        )(outs[-1], train)

        # out_layers: [stage1, stage2, stage3, context_module]
        return outs[0], outs[1], outs[2], context
