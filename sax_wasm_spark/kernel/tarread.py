"""TAR (ustar / POSIX.1-1988) reader — from-scratch per the public
ustar layout: 512-byte headers (name, octal size, typeflag, chksum,
magic, prefix), content rounded up to block boundaries, two zero
blocks at EOF. Plus the gzip unwrap (RFC 1952 via stdlib zlib,
wbits=31) for ``.tar.gz`` — the source-archive wire format crawls
carry (q91).

Header checksums are VERIFIED (the field is summed as spaces per
spec); unsupported/exotic typeflags are surfaced, not decoded (GNU
longname/pax extensions degrade to typed errors — the crawl's long
tail). ``max_out`` bounds gzip expansion DURING inflation.

The reference repo has no container surface (sax-wasm is an XML
tokenizer, ``/root/reference/src/sax/parser.rs:1``).
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass


class TarError(ValueError):
    """Typed failure for malformed/unsupported tar payloads."""


@dataclass
class TarMember:
    name: str
    size: int
    typeflag: str  # '0' file, '5' directory, others surfaced verbatim
    data: bytes  # b'' for non-files


def _octal(field: bytes) -> int:
    s = field.split(b"\x00")[0].strip()
    if not s:
        return 0
    try:
        return int(s, 8)
    except ValueError as e:
        raise TarError(f"bad octal field {field!r}") from e


def gunzip(data: bytes, max_out: int = 1 << 28) -> bytes:
    """RFC 1952 unwrap with an expansion cap enforced DURING decode.
    A stream that ends before its gzip trailer is a TYPED error — a
    truncated transfer must never return a silent prefix."""
    try:
        d = zlib.decompressobj(31)
        out = d.decompress(data, max_out + 1)
    except zlib.error as e:
        raise TarError(f"gzip: {e}") from e
    if len(out) > max_out:
        raise TarError(f"gzip output exceeds max_out={max_out}")
    if not d.eof:
        raise TarError("truncated gzip stream (no trailer)")
    return out


def tar_members(
    data: bytes, max_members: int = 1 << 16, max_out: int = 1 << 28
) -> list[TarMember]:
    """Walk a tar (gzip-unwrapped automatically when the 1f8b magic
    leads) → members in archive order, checksums verified."""
    if data[:2] == b"\x1f\x8b":
        data = gunzip(data, max_out=max_out)
    out: list[TarMember] = []
    pos = 0
    n = len(data)
    while pos + 512 <= n:
        block = data[pos : pos + 512]
        if block == b"\x00" * 512:  # EOF marker
            break
        if len(out) >= max_members:
            raise TarError(f"more than max_members={max_members}")
        magic = block[257:263]
        if magic not in (b"ustar\x00", b"ustar "):
            raise TarError(f"bad ustar magic at offset {pos}")
        stored = _octal(block[148:156])
        summed = sum(block[:148]) + 8 * 0x20 + sum(block[156:])
        if stored != summed:
            raise TarError(f"header checksum mismatch at offset {pos}")
        name = block[0:100].split(b"\x00")[0].decode("utf-8", "replace")
        prefix = block[345:500].split(b"\x00")[0].decode("utf-8", "replace")
        if prefix:
            name = prefix + "/" + name
        size = _octal(block[124:136])
        typeflag = chr(block[156]) if block[156] else "0"
        if typeflag in ("L", "K", "x", "g"):
            raise TarError(f"extension typeflag {typeflag!r} unsupported")
        pos += 512
        body = b""
        # POSIX: readers must skip size-rounded data for EVERY typeflag
        # they do not interpret — only directories never carry data.
        # '0'/'7' (regular/contiguous) surface their bytes; the rest
        # are skipped but inventoried.
        if typeflag != "5" and size:
            if pos + size > n:
                raise TarError(f"member {name!r} data truncated")
            if typeflag in ("0", "7"):
                body = data[pos : pos + size]
            pos += (size + 511) // 512 * 512
        out.append(TarMember(name, size, typeflag, body))
    else:
        # the loop ran out of input without ever seeing a zero block —
        # a truncated transfer, even when it ends on a member boundary
        raise TarError("missing end-of-archive marker")
    return out


def tar_write(
    members: list[tuple[str, bytes]], gzip_wrap: bool = False
) -> bytes:
    """Minimal writer twin: regular files (+ trailing '/' names become
    directory entries), deterministic headers (fixed mode/uid/mtime)."""
    out = bytearray()
    for name, body in members:
        is_dir = name.endswith("/")
        nb = name.encode("utf-8")
        if len(nb) > 100:
            raise TarError("name too long for the ustar name field")
        block = bytearray(512)
        block[0 : len(nb)] = nb
        block[100:108] = b"0000644\x00"
        block[108:116] = b"0000000\x00"
        block[116:124] = b"0000000\x00"
        block[124:136] = b"%011o\x00" % (0 if is_dir else len(body))
        block[136:148] = b"00000000000\x00"
        block[148:156] = b" " * 8  # checksum placeholder (spaces)
        block[156] = ord("5") if is_dir else ord("0")
        block[257:263] = b"ustar\x00"
        block[263:265] = b"00"
        chk = sum(block)
        block[148:156] = b"%06o\x00 " % chk
        out += block
        if not is_dir:
            out += body
            out += b"\x00" * (-len(body) % 512)
    out += b"\x00" * 1024
    if gzip_wrap:
        co = zlib.compressobj(6, zlib.DEFLATED, 31)
        return co.compress(bytes(out)) + co.flush()
    return bytes(out)
