"""Scoped configuration system.

TPU-native re-design of AMGX's AMG_Config subsystem
(reference: base/src/amg_config.cu, base/include/amg_config.h:163-176).

Semantics reproduced:
  * A global registry of typed parameters with defaults, descriptions and
    allowed values/ranges (``register_parameter``).
  * Config sources: "key=value;" strings (with ``scope:key=value`` prefixes),
    legacy one-per-line .cfg files, and JSON v2 objects where nested solver
    objects open child scopes via their "scope" key
    (reference: amg_config.cu parse_json_file/import_json_object).
  * Hierarchical scope lookup: ``get(name, scope)`` looks in ``scope`` first,
    then falls back to the "default" scope
    (reference: amg_config.h:197-198 getParameter).
  * ``solver(scope)=X`` syntax creating named child scopes.

No C++/CUDA is involved: the registry is plain Python, validated eagerly.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple


class AMGXConfigError(ValueError):
    """Raised on malformed config input or out-of-range parameter values."""


@dataclass
class ParameterDescription:
    """One registered parameter (reference: amg_config.h ParameterDescription)."""

    name: str
    dtype: type
    default: Any
    description: str = ""
    allowed_values: Optional[List[Any]] = None     # discrete set
    allowed_range: Optional[Tuple[Any, Any]] = None  # inclusive (min, max)

    def validate(self, value: Any) -> Any:
        value = self.coerce(value)
        if self.allowed_values is not None and value not in self.allowed_values:
            raise AMGXConfigError(
                f"Parameter '{self.name}': value {value!r} not in allowed set "
                f"{self.allowed_values}")
        if self.allowed_range is not None:
            lo, hi = self.allowed_range
            if (lo is not None and value < lo) or (hi is not None and value > hi):
                raise AMGXConfigError(
                    f"Parameter '{self.name}': value {value!r} outside range "
                    f"[{lo}, {hi}]")
        return value

    def coerce(self, value: Any) -> Any:
        if self.dtype is bool:
            if isinstance(value, str):
                return value.strip().lower() in ("1", "true", "yes", "on")
            return bool(value)
        if self.dtype is int:
            if isinstance(value, str):
                return int(float(value))
            return int(value)
        if self.dtype is float:
            return float(value)
        if self.dtype is str:
            return str(value)
        return value


# ---------------------------------------------------------------------------
# Global parameter registry (reference: AMG_Config static param_desc map).
# ---------------------------------------------------------------------------

_PARAM_REGISTRY: Dict[str, ParameterDescription] = {}


def register_parameter(name: str,
                       dtype: type,
                       default: Any,
                       description: str = "",
                       allowed_values: Optional[List[Any]] = None,
                       allowed_range: Optional[Tuple[Any, Any]] = None) -> None:
    """Register a typed parameter (reference: amg_config.h registerParameter)."""
    _PARAM_REGISTRY[name] = ParameterDescription(
        name=name, dtype=dtype, default=default, description=description,
        allowed_values=allowed_values, allowed_range=allowed_range)


def parameter_registry() -> Dict[str, ParameterDescription]:
    return _PARAM_REGISTRY


def write_parameters_description(fmt: str = "json") -> str:
    """Dump the parameter registry (reference: AMGX_write_parameters_description,
    amgx_c.h:528-530)."""
    if fmt == "json":
        out = {}
        for name, p in sorted(_PARAM_REGISTRY.items()):
            entry: Dict[str, Any] = {
                "type": p.dtype.__name__,
                "default": p.default,
                "description": p.description,
            }
            if p.allowed_values is not None:
                entry["allowed_values"] = p.allowed_values
            if p.allowed_range is not None:
                entry["allowed_range"] = list(p.allowed_range)
            out[name] = entry
        return json.dumps(out, indent=2)
    lines = []
    for name, p in sorted(_PARAM_REGISTRY.items()):
        lines.append(f"{name} ({p.dtype.__name__}, default={p.default!r}): "
                     f"{p.description}")
    return "\n".join(lines)


# ---------------------------------------------------------------------------
# AMGConfig — the scoped key/value store
# ---------------------------------------------------------------------------

_RESERVED_JSON_KEYS = ("config_version", "determinism_flag", "exception_handling",
                       "solver")


class AMGConfig:
    """Scoped configuration store mirroring AMGX's AMG_Config.

    Values are stored as ``{(scope, name): value}``. Lookup falls back from the
    requested scope to "default" (reference: amg_config.h getParameter).
    """

    def __init__(self, source: Any = None):
        self._values: Dict[Tuple[str, str], Any] = {}
        # scope -> (solver name, parent scope) for solver(scope)=X declarations
        self.scope_solvers: Dict[str, str] = {}
        if source is not None:
            if isinstance(source, dict):
                self.parse_json(source)
            elif isinstance(source, str):
                s = source.strip()
                if s.startswith("{"):
                    self.parse_json(json.loads(s))
                else:
                    self.parse_string(source)
            else:
                raise AMGXConfigError(
                    f"Unsupported config source type: {type(source)}")

    # -- mutation ----------------------------------------------------------

    def set(self, name: str, value: Any, scope: str = "default") -> None:
        desc = _PARAM_REGISTRY.get(name)
        if desc is None:
            raise AMGXConfigError(f"Unknown parameter '{name}'"
                                  f" (scope '{scope}')")
        self._values[(scope, name)] = desc.validate(value)

    # -- lookup ------------------------------------------------------------

    def get(self, name: str, scope: str = "default") -> Any:
        """Scoped lookup with fallback to the default scope, then the
        registered default value."""
        if (scope, name) in self._values:
            return self._values[(scope, name)]
        if (("default", name)) in self._values:
            return self._values[("default", name)]
        desc = _PARAM_REGISTRY.get(name)
        if desc is None:
            raise AMGXConfigError(f"Unknown parameter '{name}'")
        return desc.default

    def get_pair(self, name: str, scope: str = "default") -> Tuple[Any, str]:
        """Return (value, new_scope): when a parameter's *value* names a child
        scope (``solver(my_scope)=PCG`` / nested JSON objects), the consumer
        continues lookups in that child scope.

        Mirrors AMG_Config::getParameter(name, &value, current_scope,
        new_scope) (amg_config.h:197-198).
        """
        value = self.get(name, scope)
        new_scope = self._value_scope(name, scope)
        return value, new_scope

    def _value_scope(self, name: str, scope: str) -> str:
        key = (scope, name)
        child = self._scope_of_value.get(key)
        if child is None and (scope, name) not in self._values:
            child = self._scope_of_value.get(("default", name))
        return child if child is not None else "default"

    @property
    def _scope_of_value(self) -> Dict[Tuple[str, str], str]:
        if not hasattr(self, "_scope_map"):
            self._scope_map: Dict[Tuple[str, str], str] = {}
        return self._scope_map

    def declare_scope(self, param: str, scope: str, child_scope: str,
                      solver_name: str) -> None:
        if child_scope != "default" and child_scope in self.scope_solvers \
                and self.scope_solvers[child_scope] != solver_name:
            raise AMGXConfigError(
                f"Scope '{child_scope}' declared twice with different solvers")
        self.scope_solvers[child_scope] = solver_name
        self._scope_of_value[(scope, param)] = child_scope

    # -- parsing: "key=value;" strings --------------------------------------

    def parse_string(self, text: str) -> None:
        """Parse "key=value, key2=value2; scope:key=..." config strings
        (reference: amg_config.cu parseParameterString). Both ',' and ';'
        separate entries; whitespace/newlines are ignored."""
        for raw in _split_entries(text):
            entry = raw.strip()
            if not entry or entry.startswith("#") or entry.startswith("%"):
                continue
            if "=" not in entry:
                raise AMGXConfigError(f"Malformed config entry: '{entry}'")
            lhs, rhs = entry.split("=", 1)
            lhs, rhs = lhs.strip(), rhs.strip()
            scope = "default"
            if ":" in lhs:
                scope, lhs = lhs.split(":", 1)
                scope, lhs = scope.strip(), lhs.strip()
            # solver(child_scope)=NAME syntax
            if "(" in lhs and lhs.endswith(")"):
                param, child = lhs[:-1].split("(", 1)
                param, child = param.strip(), child.strip()
                self.set(param, rhs, scope)
                self.declare_scope(param, scope, child, rhs)
            else:
                self.set(lhs, rhs, scope)

    def parse_file(self, path: str) -> None:
        with open(path) as f:
            text = f.read()
        s = text.lstrip()
        if s.startswith("{"):
            self.parse_json(json.loads(text))
        else:
            self.parse_string(text)

    # -- parsing: JSON v2 ----------------------------------------------------

    def parse_json(self, obj: Dict[str, Any]) -> None:
        """Parse config_version=2 JSON (reference: amg_config.cu
        import_json_object). The top-level "solver" object populates the
        "default" scope; nested objects open the scope named by their own
        "scope" key."""
        if not isinstance(obj, dict):
            raise AMGXConfigError("JSON config root must be an object")
        version = obj.get("config_version", 2)
        if int(version) != 2:
            raise AMGXConfigError(f"Unsupported config_version {version}")
        solver_obj = obj.get("solver")
        if solver_obj is None:
            # allow flat {"key": value} dicts for convenience
            for k, v in obj.items():
                if k == "config_version":
                    continue
                self.set(k, v, "default")
            return
        if isinstance(solver_obj, str):
            self.set("solver", solver_obj, "default")
        else:
            self._import_json_object(solver_obj, "default", "solver")
        for k, v in obj.items():
            if k in ("config_version", "solver"):
                continue
            if isinstance(v, dict):
                self._import_json_object(v, "default", k)
            else:
                self.set(k, v, "default")

    def _import_json_object(self, obj: Dict[str, Any], enclosing_scope: str,
                            param_name: str) -> None:
        # the object's own scope; top-level solver uses the enclosing scope
        scope = obj.get("scope", enclosing_scope)
        solver_name = obj.get("solver")
        if solver_name is None:
            raise AMGXConfigError(
                f"JSON solver object for parameter '{param_name}' has no "
                f"'solver' key")
        self.set(param_name, solver_name, enclosing_scope)
        if scope != enclosing_scope:
            self.declare_scope(param_name, enclosing_scope, scope, solver_name)
        for k, v in obj.items():
            if k in ("scope", "solver"):
                continue
            if isinstance(v, dict):
                self._import_json_object(v, scope, k)
            else:
                self.set(k, v, scope)

    # -- misc ----------------------------------------------------------------

    def clone(self) -> "AMGConfig":
        c = AMGConfig()
        c._values = dict(self._values)
        c.scope_solvers = dict(self.scope_solvers)
        c._scope_map = dict(self._scope_of_value)
        return c

    def items(self):
        return self._values.items()

    def __repr__(self) -> str:
        body = ", ".join(f"{s}:{n}={v!r}" for (s, n), v in
                         sorted(self._values.items()))
        return f"AMGConfig({body})"


def _split_entries(text: str) -> List[str]:
    """Split on ',' ';' and newlines, but not inside parentheses."""
    out, cur, depth = [], [], 0
    for ch in text:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth = max(0, depth - 1)
        if ch in ",;\n" and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur))
    return out
