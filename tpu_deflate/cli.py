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

    effort, engine, args = _parse_opts(args)
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

        out = compress(data, engine=engine, effort=effort, metadata=meta)
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

    _, engine, args = _parse_opts(args)
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
        out = decompress(raw, engine=engine)
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
    effort = 2
    engine = "auto"
    rest = []
    it = iter(args)
    for a in it:
        if a == "--effort":
            effort = int(next(it))
        elif a.startswith("--effort="):
            effort = int(a.split("=", 1)[1])
        elif a == "--engine":
            engine = next(it)
        elif a.startswith("--engine="):
            engine = a.split("=", 1)[1]
        else:
            rest.append(a)
    return effort, engine, rest


def main() -> int:
    if len(sys.argv) < 2 or sys.argv[1] not in ("gzip", "gunzip"):
        print("Usage: python -m tpu_deflate.cli {gzip|gunzip} [options] InFile OutFile", file=sys.stderr)
        return 1
    if sys.argv[1] == "gzip":
        return main_gzip(sys.argv[2:])
    return main_gunzip(sys.argv[2:])


if __name__ == "__main__":
    sys.exit(main())
