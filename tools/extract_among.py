#!/usr/bin/env python3
"""Recover the Snowball `among` suffix tables from PostgreSQL's compiled
dict_snowball.so (open-source, BSD-licensed Snowball data — the published
algorithm tables, used here as a dev-time porting aid alongside
snowballstem.org's algorithm descriptions).

Generated snowball C lays each among out as an array of 32-byte structs:
  { int s_size; const symbol *s; int substring_i; int result; fnptr }
in .data.rel.ro, with R_X86_64_RELATIVE relocations patching `s` (and the
optional function pointer). We scan .data.rel.ro for maximal runs of
well-formed entries whose `s` pointer lands in .rodata and whose s_size
matches, then print each array with entry index, suffix string,
substring_i and result — enough to reconstruct the among contents and
result dispatch of every routine.

Usage: extract_among.py [--filter SCRIPTNAME-substring]
"""
import struct
import sys

SO = "/usr/lib/postgresql/15/lib/dict_snowball.so"
data = open(SO, "rb").read()

# section table
def sections():
    e_shoff = struct.unpack_from("<Q", data, 0x28)[0]
    e_shentsize = struct.unpack_from("<H", data, 0x3A)[0]
    e_shnum = struct.unpack_from("<H", data, 0x3C)[0]
    e_shstrndx = struct.unpack_from("<H", data, 0x3E)[0]
    shs = []
    for i in range(e_shnum):
        off = e_shoff + i * e_shentsize
        name, typ, flags, addr, offset, size, link, info, align, entsize = \
            struct.unpack_from("<IIQQQQIIQQ", data, off)
        shs.append((name, typ, addr, offset, size))
    stroff = shs[e_shstrndx][3]
    out = {}
    for name, typ, addr, offset, size in shs:
        end = data.index(b"\0", stroff + name)
        out[data[stroff + name:end].decode()] = (addr, offset, size)
    return out

S = sections()
ro_addr, ro_off, ro_size = S[".rodata"]
dr_addr, dr_off, dr_size = S[".data.rel.ro"]
rela_addr, rela_off, rela_size = S[".rela.dyn"]

# relocations: vaddr -> addend (R_X86_64_RELATIVE = type 8)
relocs = {}
for off in range(rela_off, rela_off + rela_size, 24):
    r_offset, r_info, r_addend = struct.unpack_from("<QQq", data, off)
    if r_info & 0xFFFFFFFF == 8:
        relocs[r_offset] = r_addend

def cstr_at(vaddr):
    if not (ro_addr <= vaddr < ro_addr + ro_size):
        return None
    off = ro_off + (vaddr - ro_addr)
    end = data.index(b"\0", off)
    return data[off:end]

# scan .data.rel.ro for among entries
entries = {}  # vaddr -> (text, substring_i, result)
va = dr_addr
while va + 32 <= dr_addr + dr_size:
    off = dr_off + (va - dr_addr)
    s_size = struct.unpack_from("<i", data, off)[0]
    sub_i, result = struct.unpack_from("<ii", data, off + 16)
    sptr = relocs.get(va + 8)
    ok = False
    if sptr is not None and 0 < s_size < 40 and -2 <= result < 40 and -1 <= sub_i < 600:
        b = cstr_at(sptr)
        if b is not None and len(b) == s_size:
            try:
                entries[va] = (b.decode("utf-8"), sub_i, result)
                ok = True
            except UnicodeDecodeError:
                # ISO_8859 single-byte build; decode latin-1 and tag
                entries[va] = (b.decode("latin-1") + " [8859]", sub_i, result)
                ok = True
    va += 32 if ok else 8

# group into maximal consecutive runs
runs = []
cur = []
prev = None
for va in sorted(entries):
    if prev is not None and va == prev + 32:
        cur.append(va)
    else:
        if len(cur) >= 1:
            runs.append(cur)
        cur = [va]
    prev = va
if cur:
    runs.append(cur)

filt = sys.argv[2] if len(sys.argv) > 2 and sys.argv[1] == "--filter" else None
for run in runs:
    if len(run) < 2:
        continue
    txts = [entries[va] for va in run]
    joined = " ".join(t for t, _, _ in txts)
    if filt and filt not in joined:
        continue
    print(f"=== among @ 0x{run[0]:x} ({len(run)} entries)")
    for t, sub_i, res in txts:
        print(f"  {t!r:30s} sub_i={sub_i:3d} result={res}")
