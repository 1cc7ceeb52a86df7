"""Build the native _seriesops extension in-place.

Usage: python native/build.py
Compiles native/seriesops.cpp into genfer_tpu/_seriesops*.so with g++.
No external dependencies (CPython C API + buffer protocol only).
"""

from __future__ import annotations

import subprocess
import sys
import sysconfig
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def build() -> Path:
    include = sysconfig.get_path("include")
    ext = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = ROOT / "genfer_tpu" / f"_seriesops{ext}"
    src = ROOT / "native" / "seriesops.cpp"
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-shared",
        "-fPIC",
        "-std=c++17",
        f"-I{include}",
        str(src),
        "-o",
        str(out),
    ]
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    path = build()
    print(f"built {path}")
    sys.path.insert(0, str(ROOT))
    from genfer_tpu import _seriesops  # noqa: F401

    print("import OK")
