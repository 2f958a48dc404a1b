"""CLI tools driven end-to-end as subprocesses (≙ reference CLI contract:
two positional args, refuses existing output, stderr reports)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(*args):
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    return subprocess.run(
        [sys.executable, "-m", "tpu_deflate.cli", *args],
        capture_output=True,
        text=True,
        env=env,
        cwd=REPO,
    )


def test_cli_roundtrip(tmp_path):
    src = tmp_path / "in.bin"
    src.write_bytes(b"The quick brown fox jumps over the lazy dog. " * 2000)
    gz = tmp_path / "out.gz"
    r = _run("gzip", "--engine", "host", "--effort", "1", str(src), str(gz))
    assert r.returncode == 0, r.stderr
    assert "MB/s" in r.stderr
    # OS gzip accepts it
    subprocess.run(["gzip", "-t", str(gz)], check=True)
    dst = tmp_path / "back.bin"
    r = _run("gunzip", "--engine", "host", str(gz), str(dst))
    assert r.returncode == 0, r.stderr
    assert dst.read_bytes() == src.read_bytes()
    assert "File name: in.bin" in r.stderr
    assert "Header CRC: present" in r.stderr
    assert "Last modified:" in r.stderr


def test_cli_native_engine_roundtrip(tmp_path):
    from tpu_deflate import native

    if not native.available():
        pytest.skip("no C toolchain")
    src = tmp_path / "a.bin"
    src.write_bytes(os.urandom(30000) + b"abc" * 20000)
    gz = tmp_path / "a.gz"
    assert _run("gzip", "--engine", "native", str(src), str(gz)).returncode == 0
    subprocess.run(["gzip", "-t", str(gz)], check=True)
    dst = tmp_path / "a.out"
    assert _run("gunzip", "--engine", "native", str(gz), str(dst)).returncode == 0
    assert dst.read_bytes() == src.read_bytes()


def test_cli_reads_os_gzip_output(tmp_path):
    src = tmp_path / "b.bin"
    src.write_bytes(b"hello world " * 5000)
    subprocess.run(["gzip", "-k", str(src)], check=True)
    dst = tmp_path / "b.out"
    r = _run("gunzip", str(src) + ".gz", str(dst))
    assert r.returncode == 0, r.stderr
    assert dst.read_bytes() == src.read_bytes()


def test_cli_error_paths(tmp_path):
    assert _run().returncode == 1
    assert _run("gzip", "/nonexistent", str(tmp_path / "x.gz")).returncode == 1
    out = tmp_path / "exists.gz"
    out.write_bytes(b"")
    src = tmp_path / "c.bin"
    src.write_bytes(b"data")
    r = _run("gzip", str(src), str(out))
    assert r.returncode == 1
    assert "already exists" in r.stderr
