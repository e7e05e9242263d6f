"""Packaging sanity: the --py-files zip must contain the whole package."""

import subprocess
import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_package_zip_complete(tmp_path, monkeypatch):
    out = subprocess.run([sys.executable, str(REPO / "tools" / "package.py")],
                         capture_output=True, text=True, check=True)
    zip_path = Path(out.stdout.strip())
    assert zip_path.exists()
    names = set(zipfile.ZipFile(zip_path).namelist())
    expected = {str(p.relative_to(REPO))
                for p in (REPO / "palladian_spark").rglob("*.py")}
    assert expected <= names
    assert "palladian_spark/__init__.py" in names
    assert "palladian_spark/streaming/incremental.py" in names


def test_run_kg_argparse_errors():
    from jobs.run_kg import main
    import pytest
    with pytest.raises(SystemExit):
        main([])           # missing required --input/--output
