#!/bin/bash
# Fresh-venv editable-install check (VERDICT r4 #7).  No network egress in
# this sandbox, so: --no-deps, --no-build-isolation, and the parent
# environment's site-packages on PYTHONPATH (for setuptools at build time
# and jax/numpy at import time).  The dependency floors themselves are
# validated by tests/test_packaging.py.
set -e
SITE=$(python - <<'PY'
import setuptools, os
print(os.path.dirname(os.path.dirname(setuptools.__file__)))
PY
)
V=$(mktemp -d)/venv
python -m venv "$V"
PYTHONPATH="$SITE" "$V/bin/pip" install -e /root/repo --no-deps --no-build-isolation -q
PYTHONPATH="$SITE" "$V/bin/wire-tpu-sweep" --help > /dev/null
PYTHONPATH="$SITE" "$V/bin/python" -c "import wire_tpu; from wire_tpu.nn import get_inr; get_inr('wire', hidden_features=16)"
echo "install check OK: $(PYTHONPATH="$SITE" "$V/bin/pip" show wire-tpu | head -2 | tr '\n' ' ')"
rm -rf "$(dirname "$V")"
