#!/usr/bin/env bash
# Packaging smoke (VERDICT r3 item 8): prove the pyproject.toml surface
# actually installs and exposes the public API + console script.
#
#   bash tools/packaging_smoke.sh
#
# Creates a CLEAN venv (with --system-site-packages so the baked-in
# jax/numpy satisfy the dependencies — this machine has no network
# egress, so pip must not try to download anything: --no-build-isolation
# reuses the system setuptools, --no-deps skips resolution), installs
# the repo editable, then exercises:
#   1. `import mpe_tpu` + make_env factory from a scratch directory
#      (i.e. resolved from site-packages, not the CWD),
#   2. the `mpe-interactive --help` console script,
#   3. one env step through the installed package.
set -euo pipefail
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
VENV="$(mktemp -d)/venv"
# CPU-only smoke: the TPU tunnel's PYTHONPATH sitecustomize would try
# (and fail) to import numpy before the venv bridge is in place
unset PYTHONPATH

python -m venv --system-site-packages "$VENV"
# the driving python may itself be a venv (e.g. /opt/venv), in which case
# --system-site-packages exposes the BASE interpreter's site-packages,
# not the driving venv's — bridge with a .pth so jax/setuptools resolve
PARENT_SP="$(python - <<'EOF'
import sysconfig
print(sysconfig.get_paths()["purelib"])
EOF
)"
VENV_SP="$("$VENV/bin/python" - <<'EOF'
import sysconfig
print(sysconfig.get_paths()["purelib"])
EOF
)"
echo "$PARENT_SP" > "$VENV_SP/_parent_env.pth"
"$VENV/bin/pip" install --no-build-isolation --no-deps --quiet -e "$ROOT"

cd "$(mktemp -d)"   # make sure imports come from the install, not CWD
"$VENV/bin/python" - <<'EOF'
import mpe_tpu
print("mpe_tpu", mpe_tpu.__version__, "from", mpe_tpu.__file__)
import jax
jax.config.update("jax_platforms", "cpu")
from mpe_tpu.factory import make_env
env = make_env("simple_spread")
env.seed(0)
obs = env.reset()
obs2, rew, done, info = env.step([[0, 1, 0, 0, 0]] * env.n)
assert len(obs2) == env.n == 3 and len(rew) == 3
print("make_env + step OK:", [o.shape for o in obs2], rew)
EOF
"$VENV/bin/mpe-interactive" --help >/dev/null
echo "mpe-interactive --help OK"
echo "PACKAGING SMOKE PASSED"
