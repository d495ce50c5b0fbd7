#!/bin/sh
# Environment check + smoke test — equivalent of the reference's
# setup_env.bat / setup_env.ps1 (venv creation is unnecessary here: all
# dependencies are baked into the image; this validates them and runs the
# post-install smoke check like the reference does with test_yolo.py).
set -e
cd "$(dirname "$0")"
echo "== dependency check =="
python - <<'EOF'
import importlib
for m in ("jax", "optax", "numpy", "cv2", "PIL", "yaml", "pytest"):
    importlib.import_module(m)
    print(f"  {m}: ok")
EOF
echo "== smoke check =="
PYTHONPATH="$(pwd)" python -m manual_yolo_tpu.cli.smoke "$@"
