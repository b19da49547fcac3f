#!/usr/bin/env bash
# Fetch the standard dataset packagings (counterpart of the reference's
# download_datasets.sh). ScanObjectNN requires manual download (license):
# https://hkust-vgd.github.io/scanobjectnn/ -> h5_files/ under $DATA.
set -e
DATA=${1:-data}
python - <<PY
from svnet_tpu.data.datasets import download
for name in ("modelnet40", "shapenetpart", "s3dis"):
    print("fetching", name)
    download(name, "$DATA")
PY
