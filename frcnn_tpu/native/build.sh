#!/bin/sh
# One-liner build (reference lib/make.sh equivalent).
cd "$(dirname "$0")" || exit 1
g++ -O3 -shared -fPIC -std=c++17 host_ops.cc -o libfrcnn_host_ops.so "$@"
# data-prep worker is optional (needs OpenCV dev files)
if pkg-config --exists opencv4 2>/dev/null; then
  g++ -O3 -shared -fPIC -std=c++17 data_prep.cc -o libfrcnn_data_prep.so \
    $(pkg-config --cflags opencv4) \
    -lopencv_core -lopencv_imgcodecs -lopencv_imgproc "$@"
else
  echo "opencv4 dev files not found - skipping libfrcnn_data_prep.so"
fi
