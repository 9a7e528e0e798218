"""Convergence criteria.

Replaces core/src/convergence/ (registry core.cu:696-701). Criteria operate
on host scalars (or per-block-component arrays when use_scalar_norm=0); the
*_CORE variants of the reference differ only in which distributed rows enter
the norm — on TPU the padded-zero invariant makes them identical, so they
alias the base criteria.
"""

from __future__ import annotations

import numpy as np


class Convergence:
    name = "ABSOLUTE"

    def __init__(self, cfg, scope: str = "default"):
        self.tolerance = cfg.get("tolerance", scope)
        self.ini_norm = None

    def init(self, nrm) -> None:
        self.ini_norm = np.asarray(nrm)

    def converged(self, nrm) -> bool:
        return bool(np.all(np.asarray(nrm) <= self.tolerance))


class AbsoluteConvergence(Convergence):
    name = "ABSOLUTE"


class RelativeIniConvergence(Convergence):
    name = "RELATIVE_INI"

    def converged(self, nrm) -> bool:
        return bool(np.all(np.asarray(nrm) <=
                           self.tolerance * self.ini_norm))


class RelativeMaxConvergence(Convergence):
    name = "RELATIVE_MAX"

    def init(self, nrm) -> None:
        super().init(nrm)
        self.max_norm = np.asarray(nrm)

    def converged(self, nrm) -> bool:
        self.max_norm = np.maximum(self.max_norm, np.asarray(nrm))
        return bool(np.all(np.asarray(nrm) <= self.tolerance * self.max_norm))


class CombinedRelIniAbsConvergence(Convergence):
    name = "COMBINED_REL_INI_ABS"

    def __init__(self, cfg, scope: str = "default"):
        super().__init__(cfg, scope)
        self.rel_tolerance = cfg.get("alt_rel_tolerance", scope)

    def converged(self, nrm) -> bool:
        nrm = np.asarray(nrm)
        return bool(np.all(nrm <= self.tolerance) or
                    np.all(nrm <= self.rel_tolerance * self.ini_norm))


_CRITERIA = {
    "ABSOLUTE": AbsoluteConvergence,
    "RELATIVE_INI": RelativeIniConvergence,
    "RELATIVE_INI_CORE": RelativeIniConvergence,
    "RELATIVE_MAX": RelativeMaxConvergence,
    "RELATIVE_MAX_CORE": RelativeMaxConvergence,
    "COMBINED_REL_INI_ABS": CombinedRelIniAbsConvergence,
}


def make_convergence(cfg, scope: str = "default") -> Convergence:
    name = cfg.get("convergence", scope)
    try:
        return _CRITERIA[name](cfg, scope)
    except KeyError:
        raise ValueError(f"Unknown convergence criterion '{name}'")
