"""Build the native host-pipeline extension.

    python csrc/setup.py build_ext --inplace

places ``semseg_tpu/data/_hostpipe*.so`` (the wrapper
``semseg_tpu/data/native.py`` falls back to the pure-Python pipeline when
the extension is absent). Links the system OpenCV C++ (imgcodecs/imgproc/
core); the pip cv2 wheel exports no OpenCV symbols, so both coexist.
"""

import os

import numpy as np
from setuptools import Extension, setup

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ext = Extension(
    "semseg_tpu.data._hostpipe",
    sources=[os.path.join(REPO, "csrc", "hostpipe.cpp")],
    include_dirs=["/usr/include/opencv4", np.get_include()],
    libraries=["opencv_imgcodecs", "opencv_imgproc", "opencv_core"],
    extra_compile_args=["-O3", "-std=c++17", "-fvisibility=hidden"],
)

setup(
    name="semseg-tpu-hostpipe",
    ext_modules=[ext],
    script_args=os.sys.argv[1:] or ["build_ext", "--inplace"],
)
