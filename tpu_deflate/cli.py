"""File CLI tools (analogs of ``src/gzip.java`` and ``src/gunzip.java``).

Same contract as the reference: exactly two positional arguments
(input file, output file), full metadata on compress (mtime, filename,
header CRC — ``src/gzip.java:52-62``), a metadata report plus MB/s
throughput on stderr for decompress (``src/gunzip.java:53-103``).

Usage:
    python -m tpu_deflate.cli gzip   <input-file> <output-file.gz>
    python -m tpu_deflate.cli gunzip <input-file.gz> <output-file>

Extra (beyond the reference): ``--effort N`` and ``--engine host|tpu``.
"""

from __future__ import annotations

import os
import sys
import time


def _usage(tool: str) -> int:
    print(f"Usage: python -m tpu_deflate.cli {tool} InFile OutFile", file=sys.stderr)
    return 1


def main_gzip(args: list[str]) -> int:
    import tpu_deflate as td
    from tpu_deflate.format.gzip_meta import GzipMetadata, OperatingSystem

    cfg, args = _parse_opts(args)
    effort, engine = cfg.encoder.effort, cfg.encoder.engine
    if len(args) != 2:
        return _usage("gzip")
    in_path, out_path = args
    if not os.path.isfile(in_path):
        print(f"Input file does not exist: {in_path}", file=sys.stderr)
        return 1
    if os.path.exists(out_path):
        print(f"Output file already exists: {out_path}", file=sys.stderr)
        return 1

    data = open(in_path, "rb").read()
    mtime = int(os.path.getmtime(in_path)) or None
    meta = GzipMetadata(
        modification_time_unix_s=mtime,
        operating_system=OperatingSystem.UNIX,
        file_name=os.path.basename(in_path),
        has_header_crc=True,
    )
    start = time.monotonic()
    if engine in ("auto", "native", "tpu"):
        from tpu_deflate.engine import compress

        out = compress(data, metadata=meta, config=cfg)
    else:
        out = td.gzip_compress(data, effort=effort, metadata=meta)
    elapsed = max(time.monotonic() - start, 1e-9)
    with open(out_path, "xb") as f:
        f.write(out)
    print(
        f"Input  speed: {len(data) / elapsed / 1e6:.2f} MB/s\n"
        f"Output speed: {len(out) / elapsed / 1e6:.2f} MB/s",
        file=sys.stderr,
    )
    return 0


def main_gunzip(args: list[str]) -> int:
    from tpu_deflate.streams.gzip_stream import GzipReader

    cfg, args = _parse_opts(args)
    engine = cfg.decoder.engine
    if len(args) != 2:
        return _usage("gunzip")
    in_path, out_path = args
    if not os.path.isfile(in_path):
        print(f"Input file does not exist: {in_path}", file=sys.stderr)
        return 1
    if os.path.exists(out_path):
        print(f"Output file already exists: {out_path}", file=sys.stderr)
        return 1

    start = time.monotonic()
    if engine in ("auto", "native", "tpu"):
        from tpu_deflate.engine import decompress

        raw = open(in_path, "rb").read()
        out = decompress(raw, config=cfg)
        meta = GzipReader(open(in_path, "rb")).metadata
    else:
        with open(in_path, "rb") as f:
            reader = GzipReader(f, multi_member=True)
            out = reader.read()
            meta = reader.metadata
    elapsed = max(time.monotonic() - start, 1e-9)

    # Metadata report (≙ gunzip.java:53-94)
    if meta.modification_time_unix_s:
        import datetime

        ts = datetime.datetime.fromtimestamp(
            meta.modification_time_unix_s, datetime.timezone.utc
        ).strftime("%Y-%m-%d %H:%M:%S UTC")
        print(f"Last modified: {ts}", file=sys.stderr)
    else:
        print("Last modified: N/A", file=sys.stderr)
    print(f"Extra flags: {meta.extra_flags}", file=sys.stderr)
    print(f"Operating system: {meta.operating_system.name}", file=sys.stderr)
    print(f"File mode: {'text' if meta.is_file_text else 'binary'}", file=sys.stderr)
    if meta.extra_field is not None:
        print(f"Extra field: {len(meta.extra_field)} bytes", file=sys.stderr)
    if meta.file_name is not None:
        print(f"File name: {meta.file_name}", file=sys.stderr)
    if meta.comment is not None:
        print(f"Comment: {meta.comment}", file=sys.stderr)
    print(f"Header CRC: {'present' if meta.has_header_crc else 'absent'}", file=sys.stderr)

    with open(out_path, "xb") as f:
        f.write(out)
    in_size = os.path.getsize(in_path)
    print(
        f"Input  speed: {in_size / elapsed / 1e6:.2f} MB/s\n"
        f"Output speed: {len(out) / elapsed / 1e6:.2f} MB/s",
        file=sys.stderr,
    )
    return 0


def _parse_opts(args: list[str]):
    """Flags -> FrameworkConfig (the §5.6 config system is the single
    source of knob defaults; flags override its fields)."""
    from dataclasses import replace

    from tpu_deflate.config import DEFAULT

    enc = DEFAULT.encoder
    dec = DEFAULT.decoder
    rest = []
    it = iter(args)
    for a in it:
        if a == "--effort":
            enc = replace(enc, effort=int(next(it)))
        elif a.startswith("--effort="):
            enc = replace(enc, effort=int(a.split("=", 1)[1]))
        elif a == "--engine":
            e = next(it)
            enc, dec = replace(enc, engine=e), replace(dec, engine=e)
        elif a.startswith("--engine="):
            e = a.split("=", 1)[1]
            enc, dec = replace(enc, engine=e), replace(dec, engine=e)
        elif a == "--member-kib":
            enc = replace(enc, member_data=int(next(it)) * 1024)
        elif a.startswith("--member-kib="):
            enc = replace(enc, member_data=int(a.split("=", 1)[1]) * 1024)
        elif a == "--no-verify":
            dec = replace(dec, verify_crc=False)
        else:
            rest.append(a)
    cfg = replace(DEFAULT, encoder=enc, decoder=dec)
    return cfg, rest


def main() -> int:
    if len(sys.argv) < 2 or sys.argv[1] not in ("gzip", "gunzip"):
        print("Usage: python -m tpu_deflate.cli {gzip|gunzip} [options] InFile OutFile", file=sys.stderr)
        return 1
    if sys.argv[1] == "gzip":
        return main_gzip(sys.argv[2:])
    return main_gunzip(sys.argv[2:])


if __name__ == "__main__":
    sys.exit(main())
