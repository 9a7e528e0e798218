"""Plugin loading.

Replaces the reference's plugin system (initialize_plugins walking
PluginConfig.txt; template_plugin/src/template_plugin.cu:38-90): a plugin is
a Python module that registers solvers/eigensolvers/parameters through the
same factory APIs the built-ins use. Modules are named in a
``PluginConfig.txt`` (one import path or file path per line) or passed
directly.
"""

from __future__ import annotations

import importlib
import importlib.util
import os
from typing import List

_loaded: List[str] = []


def load_plugin(spec: str):
    """Import one plugin by module path ('mypkg.solvers') or file path."""
    if os.path.exists(spec) and spec.endswith(".py"):
        name = os.path.splitext(os.path.basename(spec))[0]
        mod_spec = importlib.util.spec_from_file_location(name, spec)
        mod = importlib.util.module_from_spec(mod_spec)
        mod_spec.loader.exec_module(mod)
    else:
        mod = importlib.import_module(spec)
    if hasattr(mod, "initialize"):
        mod.initialize()           # reference: per-plugin initialize()
    _loaded.append(spec)
    return mod


def initialize_plugins(config_path: str = "PluginConfig.txt") -> List[str]:
    """Walk the plugin list file (reference: initialize_plugins)."""
    if not os.path.exists(config_path):
        return []
    out = []
    with open(config_path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            load_plugin(line)
            out.append(line)
    return out


def loaded_plugins() -> List[str]:
    return list(_loaded)
