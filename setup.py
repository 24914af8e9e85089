"""Build hooks for the optional native host-augmentation extension.

All project metadata lives in pyproject.toml; this file only adds the
C++ extension (native/fundus_aug.cpp — the hot elastic/gaussian/boundary
augmentation path, see uda_clr_tpu/data/native.py). The extension is a
plain extern-"C" shared object consumed via ctypes, so it is OPTIONAL:
if no C++ toolchain is available the build degrades to pure Python and
the package falls back to its scipy implementations at runtime.
"""

from setuptools import Extension, setup
from setuptools.command.build_ext import build_ext


class OptionalBuildExt(build_ext):
    """Skip (with a warning) instead of failing when the toolchain is absent."""

    def run(self):
        try:
            super().run()
        except Exception as exc:  # toolchain missing
            self._warn(exc)

    def build_extension(self, ext):
        try:
            super().build_extension(ext)
        except Exception as exc:  # compile/link failure
            self._warn(exc)

    @staticmethod
    def _warn(exc):
        import warnings

        warnings.warn(
            f"native fundus_aug extension not built ({exc!r}); "
            "uda_clr_tpu will use the scipy fallbacks (slower host "
            "augmentation, identical results)."
        )


setup(
    ext_modules=[
        Extension(
            # Built into the package next to data/native.py, which
            # globs for _fundus_aug*.so when the repo-root native/
            # build directory is not present (i.e. installed mode).
            "uda_clr_tpu.data._fundus_aug",
            sources=["native/fundus_aug.cpp"],
            extra_compile_args=["-O3", "-std=c++17", "-ffast-math"],
        )
    ],
    cmdclass={"build_ext": OptionalBuildExt},
)
