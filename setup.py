"""Build hook for the optional native extension (bin_tpu._fastops).

All metadata lives in pyproject.toml; this file only registers the C++
extension.  The extension is OPTIONAL: if the toolchain is missing the
build falls back to pure Python (bin_tpu.data.fastops has numpy fallbacks).
"""

import numpy
from setuptools import Extension, setup
from setuptools.command.build_ext import build_ext


class OptionalBuildExt(build_ext):
    def run(self):
        try:
            super().run()
        except Exception as exc:  # no toolchain → pure-python install
            print(f"WARNING: skipping native extension build: {exc}")

    def build_extension(self, ext):
        try:
            super().build_extension(ext)
        except Exception as exc:
            print(f"WARNING: failed to build {ext.name}: {exc}")


setup(
    ext_modules=[
        Extension(
            "bin_tpu._fastops",
            sources=["bin_tpu/data/_native/fastops.cpp"],
            include_dirs=[numpy.get_include()],
            extra_compile_args=["-O3", "-std=c++17"],
            language="c++",
        )
    ],
    cmdclass={"build_ext": OptionalBuildExt},
)
