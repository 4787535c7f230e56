#!/usr/bin/env bash
# Quick setup for classmate_rag_tpu: venv (optional), .env, and a `rag` shim.
set -euo pipefail

REPO_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"
cd "$REPO_DIR"

# 1. Python environment. JAX et al. are expected to be preinstalled (TPU
#    images ship them); nothing here downloads models.
if [[ "${SKIP_VENV:-0}" != "1" && ! -d .venv ]]; then
  python3 -m venv --system-site-packages .venv
  echo "created .venv (system site packages: jax/numpy come from the image)"
fi

# 2. Config file.
if [[ ! -f .env ]]; then
  cp .env.example .env
  echo "created .env from .env.example — edit to taste"
fi

# 3. CLI shim: `./rag <subcommand>` from anywhere in the repo.
cat > rag <<SH
#!/usr/bin/env bash
export PYTHONPATH="$REPO_DIR:\${PYTHONPATH:-}"
exec python -m cli.main "\$@"
SH
chmod +x rag
echo "created ./rag shim — try: ./rag stats"

# 4. Smoke check (parser only; no device work).
PYTHONPATH="$REPO_DIR" python -c "from cli.main import build_parser; build_parser()" \
  && echo "CLI parser OK"
