#!/bin/bash
# Build the C++ reference (read-only at /root/reference) out-of-tree with
# system OpenCV/TBB, for golden-parity tests (tests/test_golden.py) and
# baseline measurements (BASELINE.md).  Produces
#   /tmp/refbuild/build/bf_motion_compensator
set -e
mkdir -p /tmp/refbuild
cat > /tmp/refbuild/CMakeLists.txt <<'EOF'
cmake_minimum_required(VERSION 3.10)
project(bf_ref)
set(CMAKE_BUILD_TYPE Release)
set(CMAKE_CXX_STANDARD 14)
set(CMAKE_CXX_FLAGS "${CMAKE_CXX_FLAGS} -O3 -w -include opencv2/imgproc/types_c.h")
set(REF /root/reference/better_flow_core)
find_package(OpenCV REQUIRED)
find_package(TBB REQUIRED)
add_definitions(-DOPENCL_ENABLED=0)
include_directories(${REF}/include)
add_executable(bf_motion_compensator
    ${REF}/src/bf_motion_compensator.cpp
    ${REF}/src/event_file.cpp
    ${REF}/src/clustering.cpp
    ${REF}/src/object_model.cpp
    ${REF}/src/optimizer_global.cpp
    ${REF}/src/optimizer_sampler.cpp
    ${REF}/src/optimizer_rolling.cpp
    ${REF}/src/opencl_driver.cpp
)
target_link_libraries(bf_motion_compensator ${OpenCV_LIBS} TBB::tbb)
EOF
cd /tmp/refbuild
cmake -S . -B build -G Ninja > cmake.log 2>&1
ninja -C build
echo "built: /tmp/refbuild/build/bf_motion_compensator"
