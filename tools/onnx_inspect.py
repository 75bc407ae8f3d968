"""Quick ONNX protobuf scanner (no onnx package available).

Decodes just enough of the ONNX wire format to list graph nodes and
initializer names/shapes. ONNX = protobuf; field numbers from onnx.proto3.
"""
import struct, sys

def read_varint(buf, pos):
    result = 0; shift = 0
    while True:
        b = buf[pos]; pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80): return result, pos
        shift += 7

def iter_fields(buf):
    pos = 0
    while pos < len(buf):
        tag, pos = read_varint(buf, pos)
        fnum, wtype = tag >> 3, tag & 7
        if wtype == 0:
            val, pos = read_varint(buf, pos)
        elif wtype == 1:
            val = buf[pos:pos+8]; pos += 8
        elif wtype == 2:
            ln, pos = read_varint(buf, pos)
            val = buf[pos:pos+ln]; pos += ln
        elif wtype == 5:
            val = buf[pos:pos+4]; pos += 4
        else:
            raise ValueError(f"wire type {wtype}")
        yield fnum, wtype, val

def parse_tensor(buf):
    t = {"dims": [], "name": None, "dtype": None, "nbytes": 0}
    for fnum, wt, val in iter_fields(buf):
        if fnum == 1: t["dims"].append(val)
        elif fnum == 2: t["dtype"] = val
        elif fnum == 8: t["name"] = val.decode()
        elif fnum == 9: t["nbytes"] = len(val)
        elif fnum == 4: t["nbytes"] += 4
    return t

def parse_attr(buf):
    a = {"name": None}
    for fnum, wt, val in iter_fields(buf):
        if fnum == 1: a["name"] = val.decode()
        elif fnum == 2: a["f"] = struct.unpack("<f", val)[0]
        elif fnum == 3: a["i"] = val
        elif fnum == 4: a["s"] = val.decode(errors="replace")
        elif fnum == 8: a.setdefault("ints", []).append(val)
        elif fnum == 7: a.setdefault("floats", []).append(struct.unpack("<f", val)[0])
    return a

def parse_node(buf):
    n = {"inputs": [], "outputs": [], "op": None, "name": None, "attrs": []}
    for fnum, wt, val in iter_fields(buf):
        if fnum == 1: n["inputs"].append(val.decode())
        elif fnum == 2: n["outputs"].append(val.decode())
        elif fnum == 3: n["name"] = val.decode()
        elif fnum == 4: n["op"] = val.decode()
        elif fnum == 5: n["attrs"].append(parse_attr(val))
    return n

def parse_graph(buf):
    g = {"nodes": [], "inits": [], "inputs": [], "outputs": []}
    for fnum, wt, val in iter_fields(buf):
        if fnum == 1: g["nodes"].append(parse_node(val))
        elif fnum == 5: g["inits"].append(parse_tensor(val))
        elif fnum == 11: g["inputs"].append(val)
        elif fnum == 12: g["outputs"].append(val)
    return g

def parse_model(path):
    buf = open(path, "rb").read()
    for fnum, wt, val in iter_fields(buf):
        if fnum == 7:
            return parse_graph(val)
    raise ValueError("no graph")

if __name__ == "__main__":
    g = parse_model(sys.argv[1])
    print(f"== {sys.argv[1]}: {len(g['nodes'])} nodes, {len(g['inits'])} initializers")
    for n in g["nodes"]:
        attrs = {a['name']: a.get('ints', a.get('i', a.get('f', a.get('s')))) for a in n['attrs']}
        print(f"  {n['op']:<22} in={n['inputs']} out={n['outputs']} attrs={attrs}")
    print("-- initializers:")
    for t in g["inits"]:
        print(f"  {t['name']:<40} dims={t['dims']} dtype={t['dtype']} bytes={t['nbytes']}")
