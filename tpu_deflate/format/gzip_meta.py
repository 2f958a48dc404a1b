"""RFC 1952 gzip member header as an immutable record.

Field set, validation rules, wire layout, and error taxonomy match the
reference's ``GzipMetadata`` record (``GzipMetadata.java:30-242``):
9 fields, header-CRC16 = low 16 bits of CRC-32 over the header bytes,
reserved-flag and OS-value policing, ISO-8859-1 null-terminated strings.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field as dc_field

from ..kernels.checksum import crc32
from .errors import DataFormatError, Reason

MAGIC = 0x1F8B


class CompressionMethod(enum.Enum):
    DEFLATE = 8


class OperatingSystem(enum.IntEnum):
    """RFC 1952 OS values 0-13, plus UNKNOWN encoded on the wire as 0xFF."""

    FAT_FILESYSTEM = 0
    AMIGA = 1
    VMS = 2
    UNIX = 3
    VM_CMS = 4
    ATARI_TOS = 5
    HPFS_FILESYSTEM = 6
    MACINTOSH = 7
    Z_SYSTEM = 8
    CPM = 9
    TOPS_20 = 10
    NTFS_FILESYSTEM = 11
    QDOS = 12
    ACORN_RISCOS = 13
    UNKNOWN = 14  # wire value 0xFF


class _HeaderReader:
    """Byte reader that tracks a running CRC-32 of everything consumed."""

    def __init__(self, source):
        self._source = source
        self.crc = 0

    def read_exact(self, n: int) -> bytes:
        out = b""
        while len(out) < n:
            chunk = self._source.read(n - len(out))
            if not chunk:
                raise DataFormatError.unexpected_end()
            out += chunk
        self.crc = crc32(out, self.crc)
        return out

    def read_until_nul(self) -> bytes:
        out = bytearray()
        while True:
            b = self.read_exact(1)
            if b == b"\x00":
                return bytes(out)
            out += b


@dataclass(frozen=True)
class GzipMetadata:
    compression_method: CompressionMethod = CompressionMethod.DEFLATE
    is_file_text: bool = False
    modification_time_unix_s: int | None = None  # None <=> wire value 0
    extra_flags: int = 0
    operating_system: OperatingSystem = OperatingSystem.UNKNOWN
    extra_field: bytes | None = None
    file_name: str | None = None
    comment: str | None = None
    has_header_crc: bool = False

    def __post_init__(self):
        if not isinstance(self.compression_method, CompressionMethod):
            raise TypeError("compression_method")
        if self.modification_time_unix_s == 0:
            raise ValueError("Modification timestamp is zero")
        if self.extra_flags >> 8 != 0:
            raise ValueError("Invalid extra flags value")
        if not isinstance(self.operating_system, OperatingSystem):
            raise TypeError("operating_system")
        if self.extra_field is not None and len(self.extra_field) > 0xFFFF:
            raise ValueError("Extra field too long")

    # ------------------------------------------------------------------

    @staticmethod
    def read(source) -> "GzipMetadata":
        """Parse a gzip member header from ``source`` (``read(n)->bytes``)."""
        r = _HeaderReader(source)
        head = r.read_exact(10)
        if (head[0] << 8 | head[1]) != MAGIC:
            raise DataFormatError(Reason.GZIP_INVALID_MAGIC_NUMBER, "Invalid GZIP magic number")
        if head[2] != 8:
            raise DataFormatError(
                Reason.UNSUPPORTED_COMPRESSION_METHOD,
                f"Unsupported compression method: {head[2]}",
            )
        flags = head[3]
        if flags & 0xE0:
            raise DataFormatError(Reason.GZIP_RESERVED_FLAGS_SET, "Reserved flags are set")
        mod_time = int.from_bytes(head[4:8], "little")
        mod_time_opt = mod_time if mod_time != 0 else None
        if mod_time_opt is not None and mod_time_opt >= 1 << 31:
            mod_time_opt -= 1 << 32  # signed int32 semantics
        extra_flags = head[8]
        os_int = head[9]
        if os_int < OperatingSystem.UNKNOWN.value:
            op_sys = OperatingSystem(os_int)
        elif os_int == 0xFF:
            op_sys = OperatingSystem.UNKNOWN
        else:
            raise DataFormatError(
                Reason.GZIP_UNSUPPORTED_OPERATING_SYSTEM, "Unsupported operating system value"
            )

        is_text = bool(flags & 0x01)
        extra_field = None
        if flags & 0x04:
            ln = int.from_bytes(r.read_exact(2), "little")
            extra_field = r.read_exact(ln)
        file_name = None
        if flags & 0x08:
            file_name = r.read_until_nul().decode("latin-1")
        comment = None
        if flags & 0x10:
            comment = r.read_until_nul().decode("latin-1")
        has_crc = bool(flags & 0x02)
        if has_crc:
            expect = r.crc & 0xFFFF
            actual = int.from_bytes(r.read_exact(2), "little")
            if actual != expect:
                raise DataFormatError(Reason.HEADER_CHECKSUM_MISMATCH, "Header CRC-16 mismatch")

        return GzipMetadata(
            CompressionMethod.DEFLATE,
            is_text,
            mod_time_opt,
            extra_flags,
            op_sys,
            extra_field,
            file_name,
            comment,
            has_crc,
        )

    def to_bytes(self) -> bytes:
        out = bytearray()
        out += MAGIC.to_bytes(2, "big")
        out.append(self.compression_method.value)
        flags = (
            (1 if self.is_file_text else 0)
            | (2 if self.has_header_crc else 0)
            | (4 if self.extra_field is not None else 0)
            | (8 if self.file_name is not None else 0)
            | (16 if self.comment is not None else 0)
        )
        out.append(flags)
        mt = self.modification_time_unix_s or 0
        out += (mt & 0xFFFFFFFF).to_bytes(4, "little")
        out.append(self.extra_flags)
        os_val = self.operating_system.value
        out.append(0xFF if self.operating_system == OperatingSystem.UNKNOWN else os_val)
        if self.extra_field is not None:
            out += len(self.extra_field).to_bytes(2, "little")
            out += self.extra_field
        if self.file_name is not None:
            out += self.file_name.encode("latin-1") + b"\x00"
        if self.comment is not None:
            out += self.comment.encode("latin-1") + b"\x00"
        if self.has_header_crc:
            out += (crc32(bytes(out)) & 0xFFFF).to_bytes(2, "little")
        return bytes(out)

    def write(self, sink) -> None:
        sink.write(self.to_bytes())
