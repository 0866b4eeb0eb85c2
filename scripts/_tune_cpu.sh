#!/bin/sh
# CPU variant of the tune run (TPU tunnel may be down)
cd /root/repo
python - "$@" <<'EOF'
import sys
import jax
jax.config.update("jax_platforms", "cpu")
sys.argv = ["tune_earth.py"] + sys.argv[1:]
exec(open("scripts/tune_earth.py").read())
EOF
