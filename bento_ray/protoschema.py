"""Runtime .proto compilation without protoc.

The ``protobuf`` processor (internal/impl/pure/processor_protobuf.go)
compiles schema files at config load. This sandbox has the
google.protobuf RUNTIME (bundled with Ray) but no protoc binary, so a
minimal proto3 parser builds ``FileDescriptorProto``s directly and
registers them in a descriptor pool: messages (incl. nested), enums,
scalar/message/repeated/map-free fields, package/imports (well-known
google types resolve against their bundled descriptors).
"""

from __future__ import annotations

import os
import re

_SCALAR = {
    "double": 1, "float": 2, "int64": 3, "uint64": 4, "int32": 5,
    "fixed64": 6, "fixed32": 7, "bool": 8, "string": 9, "bytes": 12,
    "uint32": 13, "sfixed32": 15, "sfixed64": 16, "sint32": 17,
    "sint64": 18,
}

_WELL_KNOWN = {
    "google/protobuf/timestamp.proto": "google.protobuf.timestamp_pb2",
    "google/protobuf/any.proto": "google.protobuf.any_pb2",
    "google/protobuf/duration.proto": "google.protobuf.duration_pb2",
    "google/protobuf/struct.proto": "google.protobuf.struct_pb2",
    "google/protobuf/wrappers.proto": "google.protobuf.wrappers_pb2",
    "google/protobuf/empty.proto": "google.protobuf.empty_pb2",
}


def _strip_comments(src: str) -> str:
    src = re.sub(r"//[^\n]*", "", src)
    return re.sub(r"/\*.*?\*/", "", src, flags=re.S)


class _P:
    def __init__(self, src: str):
        self.toks = re.findall(
            r"[A-Za-z_][\w.]*|-?\d+|\"[^\"]*\"|[{}=;,<>\[\]]",
            _strip_comments(src))
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, t):
        got = self.next()
        if got != t:
            raise ValueError(f"proto parse: expected {t!r}, got {got!r}")


def parse_proto(src: str, name: str):
    """proto3 text → FileDescriptorProto."""
    from google.protobuf import descriptor_pb2

    fdp = descriptor_pb2.FileDescriptorProto()
    fdp.name = name
    fdp.syntax = "proto3"
    p = _P(src)

    def parse_message(msg, scope):
        while p.peek() != "}":
            t = p.next()
            if t == "message":
                nested = msg.nested_type.add()
                nested.name = p.next()
                p.expect("{")
                parse_message(nested, scope + "." + nested.name)
                p.expect("}")
            elif t == "enum":
                en = msg.enum_type.add()
                en.name = p.next()
                p.expect("{")
                while p.peek() != "}":
                    vname = p.next()
                    p.expect("=")
                    vnum = int(p.next())
                    p.expect(";")
                    v = en.value.add()
                    v.name = vname
                    v.number = vnum
                p.expect("}")
            elif t in ("optional", "repeated", "required") or t in \
                    _SCALAR or t not in ("reserved", "oneof", ";"):
                label = 1
                if t == "repeated":
                    label = 3
                    t = p.next()
                elif t in ("optional", "required"):
                    t = p.next()
                ftype = t
                fname = p.next()
                p.expect("=")
                fnum = int(p.next())
                if p.peek() == "[":
                    while p.next() != "]":
                        pass
                p.expect(";")
                f = msg.field.add()
                f.name = fname
                f.number = fnum
                f.label = label
                if ftype in _SCALAR:
                    f.type = _SCALAR[ftype]
                else:
                    f.type = 11  # TYPE_MESSAGE (enum fixed later)
                    f.type_name = ftype  # resolved in _resolve
            elif t == "reserved":
                while p.next() != ";":
                    pass
            elif t == "oneof":
                # wire-compatible: proto3 oneof members serialize as
                # ordinary singular fields; flatten them into the
                # message (the unsupported-token path used to consume
                # 'oneof' silently and then fail on '{' with a
                # misleading "expected '='" error)
                p.next()  # group name
                p.expect("{")
                parse_message(msg, scope)
                p.expect("}")
            elif t == ";":
                continue

    while p.peek() is not None:
        t = p.next()
        if t == "syntax":
            p.expect("=")
            p.next()
            p.expect(";")
        elif t == "package":
            fdp.package = p.next()
            p.expect(";")
        elif t == "import":
            dep = p.next().strip('"')
            fdp.dependency.append(dep)
            p.expect(";")
        elif t == "message":
            msg = fdp.message_type.add()
            msg.name = p.next()
            p.expect("{")
            parse_message(msg, fdp.package + "." + msg.name)
            p.expect("}")
        elif t == "enum":
            en = fdp.enum_type.add()
            en.name = p.next()
            p.expect("{")
            while p.peek() != "}":
                vname = p.next()
                p.expect("=")
                vnum = int(p.next())
                p.expect(";")
                v = en.value.add()
                v.name = vname
                v.number = vnum
            p.expect("}")
        elif t == "option":
            while p.next() != ";":
                pass
    _resolve_type_names(fdp)
    return fdp


def _resolve_type_names(fdp) -> None:
    """Qualify message/enum-type field references with a leading dot
    and set TYPE_ENUM (14) for fields referencing declared enums."""
    declared_msgs: set[str] = set()
    declared_enums: set[str] = set()

    def join(prefix, name):
        return f"{prefix}.{name}" if prefix else name

    def collect(msg, prefix):
        full = join(prefix, msg.name)
        declared_msgs.add(full)
        for en in msg.enum_type:
            declared_enums.add(join(full, en.name))
        for n in msg.nested_type:
            collect(n, full)

    for m in fdp.message_type:
        collect(m, fdp.package)
    for en in fdp.enum_type:
        declared_enums.add(join(fdp.package, en.name))

    def fix(msg, prefix):
        full = join(prefix, msg.name)
        for f in msg.field:
            if f.type == 11 and f.type_name and \
                    not f.type_name.startswith("."):
                cand = f.type_name
                # try: nested scope, package-qualified, verbatim
                for resolved in (join(full, cand),
                                 join(fdp.package, cand), cand):
                    if resolved in declared_msgs:
                        f.type_name = "." + resolved
                        break
                    if resolved in declared_enums:
                        f.type = 14  # TYPE_ENUM
                        f.type_name = "." + resolved
                        break
                else:
                    f.type_name = "." + cand
        for n in msg.nested_type:
            fix(n, full)

    for m in fdp.message_type:
        fix(m, fdp.package)


class SchemaSet:
    """Compile a directory of .proto files into message classes."""

    def __init__(self, import_paths: list[str]):
        from google.protobuf import descriptor_pool, message_factory

        self.pool = descriptor_pool.DescriptorPool()
        self._factory = message_factory
        added: set[str] = set()

        def add_well_known(dep: str):
            import importlib

            mod = importlib.import_module(_WELL_KNOWN[dep])
            self._add_file_with_deps(mod.DESCRIPTOR, added)

        files: dict[str, str] = {}
        for root in import_paths:
            for dirpath, _, names in os.walk(root):
                for n in sorted(names):
                    if n.endswith(".proto"):
                        rel = os.path.relpath(os.path.join(dirpath, n),
                                              root)
                        files[rel] = os.path.join(dirpath, n)
        parsed = {rel: parse_proto(open(path).read(), rel)
                  for rel, path in files.items()}

        def add(rel):
            if rel in added:
                return
            fdp = parsed[rel]
            for dep in fdp.dependency:
                if dep in _WELL_KNOWN:
                    add_well_known(dep)
                elif dep in parsed:
                    add(dep)
            self.pool.Add(fdp)
            added.add(rel)

        for rel in parsed:
            add(rel)

    def _add_file_with_deps(self, file_desc, added: set):
        from google.protobuf import descriptor_pb2

        if file_desc.name in added:
            return
        for dep in file_desc.dependencies:
            self._add_file_with_deps(dep, added)
        fdp = descriptor_pb2.FileDescriptorProto()
        file_desc.CopyToProto(fdp)
        try:
            self.pool.Add(fdp)
        except Exception:  # already present
            pass
        added.add(file_desc.name)

    def message_class(self, full_name: str):
        desc = self.pool.FindMessageTypeByName(full_name)
        return self._factory.GetMessageClass(desc)
