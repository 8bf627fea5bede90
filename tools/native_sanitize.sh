#!/usr/bin/env bash
# Build the native decode library + self-test under ASan and TSan and run
# them over generated fixtures (SURVEY.md §5.2 — sanitizer coverage for the
# host-native code; the XLA device path is data-race-free by construction).
set -euo pipefail
cd "$(dirname "$0")/.."

SRC=viddet_tpu/native/decode.cpp
TEST=viddet_tpu/native/selftest.cpp
OUT=/tmp/viddet_sanitize
mkdir -p "$OUT"

# fixtures
python - <<'EOF'
import cv2, numpy as np, os
os.makedirs("/tmp/viddet_sanitize", exist_ok=True)
rng = np.random.default_rng(0)
for i in range(4):
    img = rng.integers(0, 255, (100 + i * 13, 140 + i * 7, 3)).astype(np.uint8)
    cv2.imwrite(f"/tmp/viddet_sanitize/{i}.jpg", img)
vw = cv2.VideoWriter("/tmp/viddet_sanitize/v.mp4", cv2.VideoWriter_fourcc(*"mp4v"), 10, (160, 120))
for t in range(15):
    vw.write(np.full((120, 160, 3), t * 15 % 255, np.uint8))
vw.release()
EOF

LIBS="-ljpeg -lavformat -lavcodec -lavutil -lswscale -pthread"
INC="-I/usr/include/x86_64-linux-gnu"

for SAN in address thread; do
  echo "=== sanitizer: $SAN ==="
  g++ -O1 -g -std=c++17 -fsanitize=$SAN -fno-omit-frame-pointer \
      $INC "$SRC" "$TEST" -o "$OUT/selftest_$SAN" $LIBS
  # FFmpeg internals intentionally leak some global state; focus on our code.
  ASAN_OPTIONS=detect_leaks=0 TSAN_OPTIONS=ignore_noninstrumented_modules=1 \
    "$OUT/selftest_$SAN" /tmp/viddet_sanitize/*.jpg --video /tmp/viddet_sanitize/v.mp4
done
echo "ALL SANITIZER RUNS PASSED"
