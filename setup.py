"""Build shim: compiles the native C++ BM25 engine during package build.

All metadata lives in pyproject.toml; this only adds the native-library
build hook (best-effort -- the package degrades to the scipy scoring path
when no C++ toolchain is present, and can self-build later via
``mfar_tpu.native.build_native_library()``).
"""

import subprocess
import sys

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildWithNative(build_py):
    def run(self):
        try:
            subprocess.run(
                ["make", "-C", "mfar_tpu/native"],
                check=True, capture_output=True, text=True, timeout=600,
            )
            print("[setup] native BM25 engine built")
        except Exception as e:  # non-fatal: scipy fallback stays available
            print(f"[setup] native build skipped ({e}); scipy fallback in use",
                  file=sys.stderr)
        super().run()


setup(cmdclass={"build_py": BuildWithNative})
