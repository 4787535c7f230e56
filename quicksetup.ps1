# Quick setup for classmate_rag_tpu on Windows (PowerShell analog of
# quicksetup.sh; reference ships both — quicksetup.{sh,ps1}).
# Creates an optional venv, a .env from the example, and a rag.ps1 shim.
$ErrorActionPreference = "Stop"

$RepoDir = Split-Path -Parent $MyInvocation.MyCommand.Path
Set-Location $RepoDir

# 1. Python environment (JAX etc. expected preinstalled; nothing here
#    downloads models).
if ($env:SKIP_VENV -ne "1" -and -not (Test-Path ".venv")) {
    python -m venv --system-site-packages .venv
    Write-Host "created .venv (system site packages)"
}

# 2. Config file.
if (-not (Test-Path ".env")) {
    Copy-Item ".env.example" ".env"
    Write-Host "created .env from .env.example - edit to taste"
}

# 3. CLI shim: .\rag.ps1 <subcommand>
@"
`$env:PYTHONPATH = "$RepoDir;" + `$env:PYTHONPATH
python -m cli.main @args
"@ | Set-Content -Path "rag.ps1"
Write-Host "created .\rag.ps1 shim - try: .\rag.ps1 stats"

# 4. Smoke check (parser only; no device work).
python -m cli.main --help | Out-Null
Write-Host "parser OK"
