"""Load a repo-root script (bench.py, tools/*.py) as a module by path.

Single home for the spec_from_file_location dance that tests/test_bench.py,
tests/test_convergence.py and tools/northstar.py each used to carry their
own copy of (round-5 review): scripts at the repo root are not packages, so
importing them for tests/tooling needs an explicit file-location load.
Registers the module in sys.modules so dataclasses/pickling inside the
script resolve.
"""

from __future__ import annotations

import importlib.util
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_script(*relpath: str, name: str | None = None):
    """Import e.g. ``load_script("bench.py")`` or
    ``load_script("tools", "convergence_parity.py")`` from the repo root."""
    name = name or os.path.splitext(relpath[-1])[0]
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO_ROOT, *relpath))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod
