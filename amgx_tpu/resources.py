"""Resources handle (reference: base/include/resources.h:44-83).

On TPU this tracks the device set / mesh instead of CUDA devices, streams and
memory pools. Memory pooling is XLA's job; the knobs are accepted and
ignored.
"""

from __future__ import annotations

from typing import Optional

import jax

from .config import AMGConfig


class Resources:
    def __init__(self, cfg: Optional[AMGConfig] = None, devices=None,
                 mesh=None):
        self.cfg = cfg if cfg is not None else AMGConfig()
        self.devices = list(devices) if devices is not None \
            else list(jax.devices())
        self.mesh = mesh

    @property
    def num_devices(self) -> int:
        return len(self.devices)

    def __repr__(self):
        return f"Resources({len(self.devices)} devices, mesh={self.mesh})"
