"""Test-only loader for reference torch modules used as numerical oracles.

Loads ``libs/modeling`` files from the read-only reference checkout WITHOUT
triggering the package __init__ (which would import the compiled NMS
extension). Tests use these as golden implementations; the framework itself
never imports torch or the reference.
"""

import importlib.util
import sys
import types

REF_ROOT = "/root/reference"


def _load(name: str, path: str, package: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_reference_blocks():
    """Import the reference blocks.py as a standalone module tree."""
    if "refmod.blocks" in sys.modules:
        return sys.modules["refmod.blocks"]
    pkg = types.ModuleType("refmod")
    pkg.__path__ = [f"{REF_ROOT}/libs/modeling"]
    sys.modules["refmod"] = pkg
    _load("refmod.weight_init", f"{REF_ROOT}/libs/modeling/weight_init.py", "refmod")
    return _load("refmod.blocks", f"{REF_ROOT}/libs/modeling/blocks.py", "refmod")
