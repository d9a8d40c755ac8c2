#!/bin/bash
# Build native/dataio.cpp + the TSan harness under -fsanitize=thread and
# drive the 8-thread batch fan-out over synthetic images. A data race makes
# TSan abort with a report (halt_on_error=1); byte mismatches exit 1.
set -e
cd "$(dirname "$0")/.."
export PYTHONPATH=.:/root/.axon_site
TMP=$(mktemp -d)
VITAD_PLATFORM=cpu python - "$TMP" <<'PY'
import sys
from vit_ad_tpu.data.synthetic import make_mvtec_category
make_mvtec_category(sys.argv[1], "cat", img_size=96, n_train=12,
                    n_test_good=2, n_test_defect=2)
PY
g++ -O1 -g -std=c++17 -fsanitize=thread \
    native/dataio.cpp native/tsan_dataio_main.cpp \
    -o "$TMP/tsan_dataio" -lpng -ljpeg -lz -lpthread
TSAN_OPTIONS="halt_on_error=1" "$TMP/tsan_dataio" "$TMP"/cat/train/good/*.png \
    | tee tools/tsan_dataio_report.txt
echo "tsan: no races reported" >> tools/tsan_dataio_report.txt
rm -rf "$TMP"
