"""Feature configuration (.cfg) parser/writer.

The feature frontend is configured with a module-block DSL (reference:
`aku/doc/feature_configuration.txt`, parser in `aku/FeatureGenerator.cc:97`
and `aku/ModuleConfig.cc` read/write).  Grammar::

    module
    {
      name  <string>
      type  <string>
      <key> <value ... value>
      sources <name> [<name> ...]
    }

* One `module` keyword per block, `{`/`}` on their own lines.
* Inside a block each non-empty line is `key<ws>rest-of-line`; the value is
  the remainder of the line after the first whitespace split.
* Keys may not repeat within a block; module names must be unique.
* The first module must be a base module (`audiofile` or `pre`) and takes no
  `sources`; all later modules require `sources`.

This module is pure host-side text handling; no JAX.
"""

from __future__ import annotations

import io
from dataclasses import dataclass, field


class ModuleConfig:
    """Ordered key->value-string map for one module block.

    Mirrors the semantics of the reference `ModuleConfig` (aku/ModuleConfig.hh):
    values are stored as raw strings and interpreted on access as int, float,
    string, or whitespace-separated vectors thereof.
    """

    def __init__(self, items=None):
        self._names: list[str] = []
        self._values: dict[str, str] = {}
        if items:
            for k, v in items:
                self.set(k, v)

    # -- mutation ---------------------------------------------------------
    def set(self, name: str, value) -> None:
        if isinstance(value, (list, tuple)):
            value = " ".join(_fmt_scalar(v) for v in value)
        else:
            value = _fmt_scalar(value)
        if name not in self._values:
            self._names.append(name)
        self._values[name] = value

    def pop(self, name: str) -> None:
        if name in self._values:
            self._names.remove(name)
            del self._values[name]

    # -- access -----------------------------------------------------------
    def exists(self, name: str) -> bool:
        return name in self._values

    def get_str(self, name: str, default: str | None = None) -> str | None:
        return self._values.get(name, default)

    def get_int(self, name: str, default: int | None = None) -> int | None:
        v = self._values.get(name)
        return default if v is None else int(v.split()[0])

    def get_float(self, name: str, default: float | None = None) -> float | None:
        v = self._values.get(name)
        return default if v is None else float(v.split()[0])

    def get_float_vec(self, name: str, default=None):
        v = self._values.get(name)
        if v is None:
            return default
        return [float(x) for x in v.split()]

    def get_str_vec(self, name: str, default=None):
        v = self._values.get(name)
        if v is None:
            return default
        return v.split()

    def items(self):
        for n in self._names:
            yield n, self._values[n]

    def __contains__(self, name):  # convenience
        return name in self._values

    def copy(self) -> "ModuleConfig":
        return ModuleConfig(list(self.items()))

    # -- text io ----------------------------------------------------------
    def write(self, out: io.TextIOBase, indent: int = 0) -> None:
        pad = " " * indent
        inner = " " * (indent + 2)
        out.write(pad + "{\n")
        for name in self._names:
            out.write(f"{inner}{name} {self._values[name]}\n")
        out.write(pad + "}\n")


def _fmt_scalar(v) -> str:
    if isinstance(v, bool):
        return "1" if v else "0"
    if isinstance(v, float):
        # %g-style formatting like the C++ writer (str::fmt with default
        # precision); repr keeps round-trip exactness for Python floats.
        return f"{v:g}"
    return str(v)


@dataclass
class ModuleSpec:
    """One parsed module block: its name, type, sources, and config."""

    name: str
    type: str
    sources: list[str] = field(default_factory=list)
    config: ModuleConfig = field(default_factory=ModuleConfig)


BASE_MODULE_TYPES = ("audiofile", "pre")

KNOWN_MODULE_TYPES = (
    "audiofile", "pre", "fft", "mel", "power", "melpower", "dct", "delta",
    "normalization", "lin_transform", "merge", "mean_subtractor", "concat",
    "vtln", "sr_norm", "quanteq",
)


class FeatureConfig:
    """A parsed .cfg feature configuration: an ordered module DAG."""

    def __init__(self, modules: list[ModuleSpec]):
        if not modules:
            raise ValueError("feature configuration has no modules")
        self.modules = modules
        self.by_name = {}
        for m in modules:
            if m.name in self.by_name:
                raise ValueError(f"multiple definitions of module name: {m.name}")
            self.by_name[m.name] = m
        first = modules[0]
        if first.type not in BASE_MODULE_TYPES:
            raise ValueError("first module should be a base module")
        if first.sources:
            raise ValueError("can not define sources for the first module")
        for m in modules[1:]:
            if not m.sources:
                raise ValueError(f"sources not defined for module: {m.name}")
            for s in m.sources:
                if s not in self.by_name:
                    raise ValueError(f"unknown source module: {s}")

    @property
    def base(self) -> ModuleSpec:
        return self.modules[0]

    @property
    def last(self) -> ModuleSpec:
        return self.modules[-1]

    # -- parsing ----------------------------------------------------------
    @classmethod
    def parse(cls, text: str) -> "FeatureConfig":
        lines = text.splitlines()
        i = 0
        modules = []
        n = len(lines)
        while i < n:
            line = lines[i].strip(" \t")
            i += 1
            if not line:
                continue
            if line != "module":
                raise ValueError(f"expected keyword 'module' on line {i}: {line}")
            # read one { ... } block
            cfg = ModuleConfig()
            saw_open = False
            while True:
                if i >= n:
                    raise ValueError("unexpected end of module config file")
                line = lines[i].strip(" \t")
                i += 1
                if not line:
                    continue
                if not saw_open:
                    if line != "{":
                        raise ValueError(f"'{{' expected in module config file: {line}")
                    saw_open = True
                    continue
                if line == "}":
                    break
                parts = line.split(None, 1)
                if len(parts) == 1:
                    raise ValueError(f"value missing for option: {line}")
                if cfg.exists(parts[0]):
                    raise ValueError(f"value redefined: {line}")
                cfg.set(parts[0], parts[1])
            mtype = cfg.get_str("type")
            name = cfg.get_str("name")
            if mtype is None:
                raise ValueError("type not defined for module")
            if name is None:
                raise ValueError("name not defined for module")
            sources = cfg.get_str_vec("sources", [])
            spec = ModuleSpec(name=name, type=mtype, sources=sources, config=cfg)
            modules.append(spec)
        return cls(modules)

    @classmethod
    def load(cls, path) -> "FeatureConfig":
        with open(path, "r") as f:
            return cls.parse(f.read())

    # -- writing ----------------------------------------------------------
    def dump(self) -> str:
        """Write back in the reference format (FeatureGenerator.cc:223)."""
        out = io.StringIO()
        for m in self.modules:
            out.write("module\n")
            m.config.write(out, indent=0)
            out.write("\n")
        return out.getvalue()

    def save(self, path) -> None:
        with open(path, "w") as f:
            f.write(self.dump())
