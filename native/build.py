"""Build the native extensions in-place.

Usage: python native/build.py
Compiles:
  * native/seriesops.cpp -> genfer_tpu/_seriesops*.so  (f64 series kernels;
    CPython C API + buffer protocol only)
  * native/exactops.cpp  -> genfer_tpu/_exactops*.so   (GMP/MPFR-backed exact
    scalars + kernels; links the system libgmp/libmpfr runtime libraries via
    their stable ABI — dev headers are not installed in this image, see
    native/exactops_abi.h)
"""

from __future__ import annotations

import subprocess
import sys
import sysconfig
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

GMP = "/lib/x86_64-linux-gnu/libgmp.so.10"
MPFR = "/lib/x86_64-linux-gnu/libmpfr.so.6"


def build_one(src: str, name: str, extra: list[str]) -> Path:
    include = sysconfig.get_path("include")
    ext = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = ROOT / "genfer_tpu" / f"{name}{ext}"
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-shared",
        "-fPIC",
        "-std=c++17",
        f"-I{include}",
        str(ROOT / "native" / src),
        "-o",
        str(out),
        *extra,
    ]
    subprocess.run(cmd, check=True)
    return out


def build() -> list[Path]:
    outs = [build_one("seriesops.cpp", "_seriesops", [])]
    outs.append(build_one("evaltape.cpp", "_evaltape", ["-pthread"]))
    gmp, mpfr = Path(GMP), Path(MPFR)
    if gmp.exists() and mpfr.exists():
        outs.append(
            build_one("exactops.cpp", "_exactops", [str(mpfr), str(gmp)])
        )
    else:
        print("libgmp/libmpfr not found; skipping _exactops", file=sys.stderr)
    return outs


if __name__ == "__main__":
    for path in build():
        print(f"built {path}")
    sys.path.insert(0, str(ROOT))
    from genfer_tpu import _seriesops  # noqa: F401

    try:
        from genfer_tpu import _exactops  # noqa: F401

        print("import OK (_seriesops, _exactops)")
    except ImportError:
        print("import OK (_seriesops only)")
