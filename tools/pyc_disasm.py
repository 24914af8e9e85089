#!/usr/bin/env python
"""Pure-stdlib disassembler for CPython 3.8 .pyc files, runnable on any
modern CPython.

Why this exists: 10 of the reference's 14 trainer variants exist ONLY as
`train_process/__pycache__/*.cpython-38.pyc` bytecode (SURVEY.md §1).
Rounds 1-2 reconstructed their semantics from `strings`-level evidence
(symbol names, constants, docstrings). This tool recovers the full
instruction stream — opcode-by-opcode, with resolved constants, names and
jump targets — so every reconstruction claim in `train/steps.py` and
PARITY.md §2.2 can be checked against the actual compiled control/data
flow instead of a bag of symbols.

The host interpreter (3.12 here) cannot unmarshal 3.8 code objects (the
marshal code-object layout and the opcode table both changed), so this
file carries:
  * a minimal reimplementation of the 3.8 `marshal.loads` object graph
    reader (refs, interning, code objects — CPython Python/marshal.c),
  * the complete CPython 3.8 opcode table (Lib/opcode.py @ v3.8.0),
  * a `dis`-style renderer (wordcode, EXTENDED_ARG folding, lnotab line
    numbers, nested code objects).

Usage:
    python tools/pyc_disasm.py FILE.pyc [--func NAME] [--grep PATTERN]

`--func` prints only code objects whose qualname contains NAME;
`--grep` prints only instruction lines matching PATTERN (with function
headers kept for context).
"""

from __future__ import annotations

import argparse
import re
import struct
import sys

# --------------------------------------------------------------------------
# CPython 3.8 opcode table (Lib/opcode.py, tag v3.8.0). Verbatim numbering.
# --------------------------------------------------------------------------

OPNAME = {}


def _def(name, code):
    OPNAME[code] = name


for _name, _code in [
    ("POP_TOP", 1), ("ROT_TWO", 2), ("ROT_THREE", 3), ("DUP_TOP", 4),
    ("DUP_TOP_TWO", 5), ("ROT_FOUR", 6), ("NOP", 9),
    ("UNARY_POSITIVE", 10), ("UNARY_NEGATIVE", 11), ("UNARY_NOT", 12),
    ("UNARY_INVERT", 15),
    ("BINARY_MATRIX_MULTIPLY", 16), ("INPLACE_MATRIX_MULTIPLY", 17),
    ("BINARY_POWER", 19), ("BINARY_MULTIPLY", 20), ("BINARY_MODULO", 22),
    ("BINARY_ADD", 23), ("BINARY_SUBTRACT", 24), ("BINARY_SUBSCR", 25),
    ("BINARY_FLOOR_DIVIDE", 26), ("BINARY_TRUE_DIVIDE", 27),
    ("INPLACE_FLOOR_DIVIDE", 28), ("INPLACE_TRUE_DIVIDE", 29),
    ("GET_AITER", 50), ("GET_ANEXT", 51), ("BEFORE_ASYNC_WITH", 52),
    ("BEGIN_FINALLY", 53), ("END_ASYNC_FOR", 54),
    ("INPLACE_ADD", 55), ("INPLACE_SUBTRACT", 56), ("INPLACE_MULTIPLY", 57),
    ("INPLACE_MODULO", 59), ("STORE_SUBSCR", 60), ("DELETE_SUBSCR", 61),
    ("BINARY_LSHIFT", 62), ("BINARY_RSHIFT", 63), ("BINARY_AND", 64),
    ("BINARY_XOR", 65), ("BINARY_OR", 66), ("INPLACE_POWER", 67),
    ("GET_ITER", 68), ("GET_YIELD_FROM_ITER", 69), ("PRINT_EXPR", 70),
    ("LOAD_BUILD_CLASS", 71), ("YIELD_FROM", 72), ("GET_AWAITABLE", 73),
    ("INPLACE_LSHIFT", 75), ("INPLACE_RSHIFT", 76), ("INPLACE_AND", 77),
    ("INPLACE_XOR", 78), ("INPLACE_OR", 79),
    ("WITH_CLEANUP_START", 81), ("WITH_CLEANUP_FINISH", 82),
    ("RETURN_VALUE", 83), ("IMPORT_STAR", 84), ("SETUP_ANNOTATIONS", 85),
    ("YIELD_VALUE", 86), ("POP_BLOCK", 87), ("END_FINALLY", 88),
    ("POP_EXCEPT", 89),
    # >= HAVE_ARGUMENT (90)
    ("STORE_NAME", 90), ("DELETE_NAME", 91), ("UNPACK_SEQUENCE", 92),
    ("FOR_ITER", 93), ("UNPACK_EX", 94), ("STORE_ATTR", 95),
    ("DELETE_ATTR", 96), ("STORE_GLOBAL", 97), ("DELETE_GLOBAL", 98),
    ("LOAD_CONST", 100), ("LOAD_NAME", 101), ("BUILD_TUPLE", 102),
    ("BUILD_LIST", 103), ("BUILD_SET", 104), ("BUILD_MAP", 105),
    ("LOAD_ATTR", 106), ("COMPARE_OP", 107), ("IMPORT_NAME", 108),
    ("IMPORT_FROM", 109), ("JUMP_FORWARD", 110),
    ("JUMP_IF_FALSE_OR_POP", 111), ("JUMP_IF_TRUE_OR_POP", 112),
    ("JUMP_ABSOLUTE", 113), ("POP_JUMP_IF_FALSE", 114),
    ("POP_JUMP_IF_TRUE", 115), ("LOAD_GLOBAL", 116),
    ("SETUP_FINALLY", 122), ("LOAD_FAST", 124), ("STORE_FAST", 125),
    ("DELETE_FAST", 126), ("RAISE_VARARGS", 130), ("CALL_FUNCTION", 131),
    ("MAKE_FUNCTION", 132), ("BUILD_SLICE", 133), ("LOAD_CLOSURE", 135),
    ("LOAD_DEREF", 136), ("STORE_DEREF", 137), ("DELETE_DEREF", 138),
    ("CALL_FUNCTION_KW", 141), ("CALL_FUNCTION_EX", 142),
    ("SETUP_WITH", 143), ("EXTENDED_ARG", 144), ("LIST_APPEND", 145),
    ("SET_ADD", 146), ("MAP_ADD", 147), ("LOAD_CLASSDEREF", 148),
    ("BUILD_LIST_UNPACK", 149), ("BUILD_MAP_UNPACK", 150),
    ("BUILD_MAP_UNPACK_WITH_CALL", 151), ("BUILD_TUPLE_UNPACK", 152),
    ("BUILD_SET_UNPACK", 153), ("SETUP_ASYNC_WITH", 154),
    ("FORMAT_VALUE", 155), ("BUILD_CONST_KEY_MAP", 156),
    ("BUILD_STRING", 157), ("BUILD_TUPLE_UNPACK_WITH_CALL", 158),
    ("LOAD_METHOD", 160), ("CALL_METHOD", 161), ("CALL_FINALLY", 162),
    ("POP_FINALLY", 163),
]:
    _def(_name, _code)

HAVE_ARGUMENT = 90
EXTENDED_ARG = 144

HASCONST = {100}
HASNAME = {90, 91, 95, 96, 97, 98, 101, 106, 108, 109, 116, 160}
HASLOCAL = {124, 125, 126}
HASFREE = {135, 136, 137, 138, 148}
HASJREL = {93, 110, 122, 143, 154, 162}
HASJABS = {111, 112, 113, 114, 115}
HASCOMPARE = {107}

CMP_OP = ('<', '<=', '==', '!=', '>', '>=', 'in', 'not in', 'is', 'is not',
          'exception match', 'BAD')

MAGIC_38 = (3400, 3401, 3410, 3411, 3412, 3413)  # 3.8 alphas..3.8.0 final


# --------------------------------------------------------------------------
# Marshal reader (CPython Python/marshal.c, r_object, 3.8 layout)
# --------------------------------------------------------------------------


class Code38:
    """Container mirroring a 3.8 code object's marshal fields."""

    def __init__(self, **kw):
        self.__dict__.update(kw)

    def __repr__(self):
        return f"<code38 {self.co_name} @{self.co_filename}:{self.co_firstlineno}>"


class _Reader:
    FLAG_REF = 0x80

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.refs = []

    def _bytes(self, n):
        b = self.data[self.pos:self.pos + n]
        if len(b) != n:
            raise EOFError("truncated marshal data")
        self.pos += n
        return b

    def _byte(self):
        return self._bytes(1)[0]

    def _long(self):
        return struct.unpack("<i", self._bytes(4))[0]

    def _reserve(self, flag):
        if flag:
            self.refs.append(None)
            return len(self.refs) - 1
        return None

    def _insert(self, obj, idx, flag):
        if flag:
            self.refs[idx] = obj
        return obj

    def _note(self, obj, flag):
        if flag:
            self.refs.append(obj)
        return obj

    def r_object(self):
        t = self._byte()
        flag = bool(t & self.FLAG_REF)
        t = chr(t & ~self.FLAG_REF)

        if t == '0':
            return None  # NULL sentinel (dict terminator)
        if t == 'N':
            return None
        if t == 'F':
            return False
        if t == 'T':
            return True
        if t == 'S':
            return StopIteration
        if t == '.':
            return Ellipsis
        if t == 'i':
            return self._note(self._long(), flag)
        if t == 'g':
            return self._note(struct.unpack("<d", self._bytes(8))[0], flag)
        if t == 'y':
            re_, im = struct.unpack("<dd", self._bytes(16))
            return self._note(complex(re_, im), flag)
        if t == 'l':
            n = self._long()
            sign = -1 if n < 0 else 1
            n = abs(n)
            val = 0
            for i in range(n):
                d = struct.unpack("<H", self._bytes(2))[0]
                val |= d << (15 * i)
            return self._note(sign * val, flag)
        if t == 's':  # bytes
            n = self._long()
            return self._note(self._bytes(n), flag)
        if t in ('u', 't'):  # unicode / legacy interned unicode
            n = self._long()
            return self._note(self._bytes(n).decode("utf-8", "surrogatepass"), flag)
        if t in ('a', 'A'):  # ascii
            n = self._long()
            return self._note(self._bytes(n).decode("ascii"), flag)
        if t in ('z', 'Z'):  # short ascii
            n = self._byte()
            return self._note(self._bytes(n).decode("ascii"), flag)
        if t == 'r':
            return self.refs[self._long()]
        if t in ('(', ')'):
            n = self._byte() if t == ')' else self._long()
            idx = self._reserve(flag)
            items = tuple(self.r_object() for _ in range(n))
            return self._insert(items, idx, flag)
        if t == '[':
            n = self._long()
            idx = self._reserve(flag)
            items = [self.r_object() for _ in range(n)]
            return self._insert(items, idx, flag)
        if t == '{':
            idx = self._reserve(flag)
            d = {}
            while True:
                k = self.r_object()
                if k is None:  # NULL terminator (ambiguity with real None is
                    break      # irrelevant for code objects, which hold no dicts)
                d[k] = self.r_object()
            return self._insert(d, idx, flag)
        if t in ('<', '>'):
            n = self._long()
            idx = self._reserve(flag)
            items = {self.r_object() for _ in range(n)}
            return self._insert(frozenset(items) if t == '>' else items, idx, flag)
        if t == 'c':
            idx = self._reserve(flag)
            co = Code38(
                co_argcount=self._long(),
                co_posonlyargcount=self._long(),
                co_kwonlyargcount=self._long(),
                co_nlocals=self._long(),
                co_stacksize=self._long(),
                co_flags=self._long(),
                co_code=self.r_object(),
                co_consts=self.r_object(),
                co_names=self.r_object(),
                co_varnames=self.r_object(),
                co_freevars=self.r_object(),
                co_cellvars=self.r_object(),
                co_filename=self.r_object(),
                co_name=self.r_object(),
            )
            co.co_firstlineno = self._long()
            co.co_lnotab = self.r_object()
            return self._insert(co, idx, flag)
        raise ValueError(f"unhandled marshal type {t!r} at offset {self.pos - 1}")


def load_pyc(path: str) -> Code38:
    with open(path, "rb") as f:
        header = f.read(16)
        magic = struct.unpack("<H", header[:2])[0]
        if magic not in MAGIC_38:
            raise ValueError(
                f"{path}: magic {magic} is not CPython 3.8 "
                f"(3.8 header = 16 bytes: magic/bitfield/mtime/size)"
            )
        data = f.read()
    return _Reader(data).r_object()


# --------------------------------------------------------------------------
# Disassembler (wordcode + lnotab, as in 3.8 Lib/dis.py)
# --------------------------------------------------------------------------


def _line_starts(co: Code38):
    """offset -> line (start offsets only), from co_lnotab pairs."""
    out = {}
    line = co.co_firstlineno
    addr = 0
    out[0] = line
    tab = co.co_lnotab
    for i in range(0, len(tab), 2):
        addr_incr, line_incr = tab[i], tab[i + 1]
        if line_incr >= 0x80:
            line_incr -= 0x100
        addr += addr_incr
        line += line_incr
        out[addr] = line
    return out


def disassemble(co: Code38, out, grep=None):
    lines = _line_starts(co)
    code = co.co_code
    ext = 0
    buffered_header_emitted = False

    def emit(s):
        nonlocal buffered_header_emitted
        if grep is None or re.search(grep, s):
            if not buffered_header_emitted:
                buffered_header_emitted = True
            out.write(s + "\n")

    header = (
        f"\n== {co.co_name}  ({co.co_filename}:{co.co_firstlineno})"
        f"  args={co.co_argcount} locals={co.co_varnames[:co.co_argcount]}"
    )
    if grep is None:
        out.write(header + "\n")
    else:
        # with grep, print header only if something matches
        matched = []
        sink = type("S", (), {"write": lambda self, s: matched.append(s)})()
        _render(co, code, lines, sink.write, grep)
        if matched:
            out.write(header + "\n")
            out.writelines(matched)
        _recurse(co, out, grep)
        return

    _render(co, code, lines, out.write, None)
    _recurse(co, out, grep)


def _render(co, code, lines, write, grep):
    ext = 0
    for off in range(0, len(code), 2):
        op, raw_arg = code[off], code[off + 1]
        arg = ext | raw_arg
        ext = (arg << 8) if op == EXTENDED_ARG else 0
        if op == EXTENDED_ARG:
            continue
        name = OPNAME.get(op, f"<op {op}>")
        argval = ""
        if op >= HAVE_ARGUMENT:
            if op in HASCONST:
                c = co.co_consts[arg]
                argval = f"<code {c.co_name}>" if isinstance(c, Code38) else repr(c)
            elif op in HASNAME:
                argval = co.co_names[arg]
            elif op in HASLOCAL:
                argval = co.co_varnames[arg]
            elif op in HASFREE:
                cellfree = co.co_cellvars + co.co_freevars
                argval = cellfree[arg] if arg < len(cellfree) else f"?{arg}"
            elif op in HASCOMPARE:
                argval = CMP_OP[arg] if arg < len(CMP_OP) else f"?{arg}"
            elif op in HASJREL:
                argval = f"-> {off + 2 + arg}"
            elif op in HASJABS:
                argval = f"-> {arg}"
            else:
                argval = str(arg)
        ln = lines.get(off)
        lncol = f"{ln:5d}" if ln is not None else "     "
        s = f"{lncol} {off:6d} {name:<28s} {argval}"
        if grep is None or re.search(grep, s):
            write(s + "\n")


def _recurse(co, out, grep):
    for c in co.co_consts:
        if isinstance(c, Code38):
            disassemble(c, out, grep)


def iter_codes(co: Code38):
    yield co
    for c in co.co_consts:
        if isinstance(c, Code38):
            yield from iter_codes(c)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("pyc")
    ap.add_argument("--func", help="only code objects whose name contains this")
    ap.add_argument("--grep", help="only instruction lines matching this regex")
    args = ap.parse_args(argv)

    top = load_pyc(args.pyc)
    if args.func:
        found = False
        for co in iter_codes(top):
            if args.func in co.co_name:
                found = True
                disassemble(co, sys.stdout, args.grep)
        if not found:
            print(f"no code object matching {args.func!r}", file=sys.stderr)
            return 1
    else:
        disassemble(top, sys.stdout, args.grep)
    return 0


if __name__ == "__main__":
    sys.exit(main())
