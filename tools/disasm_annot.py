#!/usr/bin/env python3
"""Annotate objdump output of dict_snowball.so for stemmer reconstruction.

Dev-time aid (same spirit as extract_among.py): the compiled Snowball C in
PostgreSQL's dict_snowball.so is BSD-licensed published algorithm data; we
read the generated code's structure back out to reconstruct routine control
flow (literal matches via eq_s_b, groupings via *_grouping_*, slices) for
languages whose .sbl uses literal or-chains instead of among tables.

Usage: disasm_annot.py <start-hex> <stop-hex>
Annotates:
  - lea x(%rip) targets that land in .rodata with the decoded C string
  - SN_env field offsets on 0x..(%rbx)/(%rdi) accesses
  - grouping bitmaps (8-byte runs in .rodata) printed as bit lists
"""
import re
import struct
import subprocess
import sys

SO = "/usr/lib/postgresql/15/lib/dict_snowball.so"
data = open(SO, "rb").read()

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

FIELDS = {0x0: "p", 0x8: "c", 0xc: "l", 0x10: "lb", 0x14: "bra", 0x18: "ket",
          0x20: "S", 0x28: "I(bool)", 0x30: "B"}

def cstr_at(vaddr, maxlen=48):
    if not (ro_addr <= vaddr < ro_addr + ro_size):
        return None
    off = ro_off + (vaddr - ro_addr)
    end = data.index(b"\0", off)
    if end - off > maxlen:
        return None
    b = data[off:end]
    try:
        return b.decode("utf-8")
    except UnicodeDecodeError:
        return repr(b)

start, stop = int(sys.argv[1], 16), int(sys.argv[2], 16)
out = subprocess.run(
    ["objdump", "-d", f"--start-address={start:#x}", f"--stop-address={stop:#x}", SO],
    capture_output=True, text=True).stdout

lea_re = re.compile(r"lea\s+(-?0x[0-9a-f]+)\(%rip\).*#\s*([0-9a-f]+)")
mem_re = re.compile(r"0x([0-9a-f]+)\(%r(bx|di|bp|12|13|14|15)\)")

for line in out.splitlines():
    ann = []
    m = lea_re.search(line)
    if m:
        tgt = int(m.group(2), 16)
        s = cstr_at(tgt)
        if s is not None:
            ann.append(f'STR "{s}"')
        else:
            # maybe a grouping bitmap: print 16 bytes as bits
            if ro_addr <= tgt < ro_addr + ro_size:
                off = ro_off + (tgt - ro_addr)
                bts = data[off:off + 24]
                ann.append("BYTES " + bts.hex())
    for fm in mem_re.finditer(line):
        o = int(fm.group(1), 16)
        if o in FIELDS and fm.group(2) in ("bx", "di"):
            ann.append(f"z->{FIELDS[o]}")
    print(line + ("   ## " + " | ".join(ann) if ann else ""))
