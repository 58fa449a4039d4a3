"""Bloblang recursive-descent parser → tuple AST.

Grammar follows the reference parser package
(internal/bloblang/parser/: mapping_parser.go statement forms,
query_arithmetic_parser.go operator tiers, query_expression_parser.go
if/match, query_function_parser.go functions/methods/lambdas).

Operator precedence replicates arithmetic.go's four resolution passes
(tightest first): ``* / % |`` → ``+ -`` → comparisons → ``&& ||``
(one left-associative tier).

AST nodes (tuples, first element is the kind):
  queries:   ("lit",v) ("arraylit",[q]) ("objectlit",[(kq,vq)])
             ("context",base,segs)   base: "this"|"root"|("var",name)|
                                           ("named",name)
             ("meta",name|None) ("func",name,args,kwargs)
             ("method",target,name,args,kwargs) ("lambda",param,body)
             ("not",q) ("neg",q) ("binop",op,l,r)
             ("if",[(cond,q)...],else|None)
             ("match",operand|None,[(kind,caseq,resq)])  kind:
                 "bool"|"lit"|"default"
  statements: ("assign",target,q)    target: ("root",segs)|
                  ("meta",key|None)|("var",name)
             ("mapdef",name,[stmts]) ("ifstmt",[(cond,[stmts])...],else)
"""

from __future__ import annotations

from bento_ray.blobl.lexer import Token, tokenize


class ParseError(ValueError):
    pass


class Parser:
    def __init__(self, src: str):
        self.toks = tokenize(src)
        self.pos = 0
        self.lambda_params: list[str] = []

    # ------------------------------------------------------------- utils
    def peek(self, k: int = 0) -> Token:
        return self.toks[min(self.pos + k, len(self.toks) - 1)]

    def next(self) -> Token:
        t = self.toks[self.pos]
        if t.kind != "EOF":
            self.pos += 1
        return t

    def at_op(self, *vals) -> bool:
        t = self.peek()
        return t.kind == "OP" and t.value in vals

    def expect_op(self, val) -> Token:
        t = self.next()
        if t.kind != "OP" or t.value != val:
            raise ParseError(
                f"expected {val!r}, got {t.kind}:{t.value!r} at line {t.line}")
        return t

    def skip_newlines(self):
        while self.peek().kind == "NEWLINE":
            self.next()

    # --------------------------------------------------------- statements
    def parse_mapping(self) -> list:
        stmts = []
        self.skip_newlines()
        while self.peek().kind != "EOF":
            stmts.append(self.parse_statement())
            self.skip_newlines()
        return stmts

    def parse_statement(self):
        t = self.peek()
        stmt = self._parse_statement_inner(t)
        if stmt[0] == "assign":
            return stmt + (t.line,)
        return stmt

    def _parse_statement_inner(self, t):
        if t.kind == "IDENT" and t.value == "map" and \
                self.peek(1).kind in ("IDENT", "STRING"):
            return self.parse_mapdef()
        if t.kind == "IDENT" and t.value == "let":
            self.next()
            name_t = self.next()
            if name_t.kind not in ("IDENT", "STRING"):
                raise ParseError(f"bad let name at line {name_t.line}")
            self.expect_op("=")
            return ("assign", ("var", name_t.value), self.parse_query())
        if t.kind == "IDENT" and t.value == "meta":
            nxt = self.peek(1)
            if (nxt.kind == "OP" and nxt.value == "=") or \
                    nxt.kind in ("IDENT", "STRING"):
                self.next()
                key = None
                if self.peek().kind in ("IDENT", "STRING"):
                    key = self.next().value
                self.expect_op("=")
                return ("assign", ("meta", key), self.parse_query())
        if t.kind == "IDENT" and t.value == "root":
            segs = self.parse_lhs_path(skip_first=True)
            self.expect_op("=")
            return ("assign", ("root", segs), self.parse_query())
        if t.kind == "IDENT" and t.value == "if":
            return self.parse_if_statement()
        if t.kind == "IDENT":
            segs = self.parse_lhs_path(skip_first=False)
            self.expect_op("=")
            return ("assign", ("root", segs), self.parse_query())
        raise ParseError(
            f"unexpected statement start {t.kind}:{t.value!r} line {t.line}")

    def parse_lhs_path(self, skip_first: bool) -> list:
        segs: list = []
        if skip_first:
            self.next()  # 'root'
        else:
            segs.append(self.next().value)
        while self.at_op("."):
            self.next()
            t = self.next()
            if t.kind in ("IDENT", "STRING"):
                segs.append(t.value)
            elif t.kind == "NUMBER" and isinstance(t.value, int):
                segs.append(t.value)
            else:
                raise ParseError(f"bad path segment at line {t.line}")
        return segs

    def parse_mapdef(self):
        self.next()  # 'map'
        name = self.next().value
        self.expect_op("{")
        self.skip_newlines()
        stmts = []
        while not self.at_op("}"):
            stmts.append(self.parse_statement())
            self.skip_newlines()
        self.expect_op("}")
        return ("mapdef", name, stmts)

    def parse_if_statement(self):
        self.next()  # 'if'
        branches = []
        cond = self.parse_query(stop_at_brace=True)
        branches.append((cond, self.parse_stmt_block()))
        else_stmts = None
        while True:
            save = self.pos
            self.skip_newlines()
            t = self.peek()
            if t.kind == "IDENT" and t.value == "else":
                self.next()
                t2 = self.peek()
                if t2.kind == "IDENT" and t2.value == "if":
                    self.next()
                    cond = self.parse_query(stop_at_brace=True)
                    branches.append((cond, self.parse_stmt_block()))
                else:
                    else_stmts = self.parse_stmt_block()
                    break
            else:
                self.pos = save
                break
        return ("ifstmt", branches, else_stmts)

    def parse_stmt_block(self) -> list:
        self.expect_op("{")
        self.skip_newlines()
        stmts = []
        while not self.at_op("}"):
            stmts.append(self.parse_statement())
            self.skip_newlines()
        self.expect_op("}")
        return stmts

    # ------------------------------------------------------------ queries
    def parse_query(self, stop_at_brace: bool = False):
        return self.parse_bool_tier(stop_at_brace)

    def parse_bool_tier(self, sb=False):
        left = self.parse_cmp_tier(sb)
        while self.at_op("&&", "||"):
            op = self.next().value
            self._skip_nl_in_expr()
            right = self.parse_cmp_tier(sb)
            left = ("binop", op, left, right)
        return left

    def parse_cmp_tier(self, sb=False):
        left = self.parse_sum_tier(sb)
        while self.at_op("==", "!=", ">", "<", ">=", "<="):
            # `x > 5 {` in if-conditions: comparisons bind before brace
            op = self.next().value
            self._skip_nl_in_expr()
            right = self.parse_sum_tier(sb)
            left = ("binop", op, left, right)
        return left

    def parse_sum_tier(self, sb=False):
        left = self.parse_prod_tier(sb)
        while self.at_op("+", "-"):
            op = self.next().value
            self._skip_nl_in_expr()
            right = self.parse_prod_tier(sb)
            left = ("binop", op, left, right)
        return left

    def parse_prod_tier(self, sb=False):
        left = self.parse_unary(sb)
        while self.at_op("*", "/", "%", "|"):
            if self.at_op("|") and self.peek(1).kind == "OP" and \
                    self.peek(1).value == "|":
                break
            op = self.next().value
            self._skip_nl_in_expr()
            right = self.parse_unary(sb)
            left = ("binop", op, left, right)
        return left

    def _skip_nl_in_expr(self):
        while self.peek().kind == "NEWLINE":
            self.next()

    def parse_unary(self, sb=False):
        if self.at_op("!"):
            self.next()
            return ("not", self.parse_unary(sb))
        if self.at_op("-"):
            self.next()
            return ("neg", self.parse_unary(sb))
        return self.parse_postfix(sb)

    def parse_postfix(self, sb=False):
        node = self.parse_primary(sb)
        while True:
            if self.at_op("."):
                # allow "target.\n  method()" — dot at end of line
                self.next()
                self.skip_newlines()
                t = self.next()
                if t.kind == "NUMBER" and isinstance(t.value, int):
                    node = self._extend_path(node, t.value)
                    continue
                if t.kind == "STRING":
                    node = self._extend_path(node, t.value)
                    continue
                if t.kind != "IDENT" and t.kind != "UNDERSCORE":
                    raise ParseError(
                        f"expected method/field after '.' line {t.line}")
                name = t.value
                if self.at_op("("):
                    args, kwargs = self.parse_args()
                    node = ("method", node, name, args, kwargs)
                else:
                    node = self._extend_path(node, name)
                continue
            if self.at_op("["):
                # index access: a[0] — not core Bloblang but harmless
                self.next()
                idx = self.parse_query()
                self.expect_op("]")
                node = ("method", node, "index", [idx], {})
                continue
            break
        return node

    @staticmethod
    def _extend_path(node, seg):
        if node[0] == "context":
            return ("context", node[1], node[2] + [seg])
        if node[0] == "getpath":
            return ("getpath", node[1], node[2] + [seg])
        return ("getpath", node, [seg])

    def parse_args(self) -> tuple[list, dict]:
        self.expect_op("(")
        args: list = []
        kwargs: dict = {}
        self.skip_newlines()
        while not self.at_op(")"):
            # named arg: IDENT ':' expr
            if self.peek().kind == "IDENT" and \
                    self.peek(1).kind == "OP" and self.peek(1).value == ":":
                name = self.next().value
                self.next()
                kwargs[name] = self.parse_lambda_or_query()
            else:
                args.append(self.parse_lambda_or_query())
            self.skip_newlines()
            if self.at_op(","):
                self.next()
                self.skip_newlines()
        self.expect_op(")")
        return args, kwargs

    def parse_lambda_or_query(self):
        t, t1 = self.peek(), self.peek(1)
        if t.kind == "IDENT" and t1.kind == "OP" and t1.value == "->":
            param = self.next().value
            self.next()
            self._skip_nl_in_expr()
            self.lambda_params.append(param)
            try:
                body = self.parse_query()
            finally:
                self.lambda_params.pop()
            return ("lambda", param, body)
        return self.parse_query()

    def parse_primary(self, sb=False):
        t = self.peek()
        if t.kind == "NUMBER" or t.kind == "STRING" or t.kind == "BOOL" \
                or t.kind == "NULL":
            self.next()
            return ("lit", t.value)
        if t.kind == "OP":
            if t.value == "(":
                self.next()
                q = self.parse_query()
                self.expect_op(")")
                return q
            if t.value == "[":
                return self.parse_array_literal()
            if t.value == "{":
                return self.parse_object_literal()
            if t.value == "$":
                self.next()
                name = self.next().value
                return ("context", ("var", name), [])
            if t.value == "@":
                self.next()
                if self.peek().kind in ("IDENT", "STRING"):
                    return ("meta", self.next().value)
                return ("meta", None)
        if t.kind == "IDENT":
            word = t.value
            if word == "this":
                self.next()
                return ("context", "this", [])
            if word == "root":
                self.next()
                return ("context", "root", [])
            if word == "if":
                return self.parse_if_expr()
            if word == "match":
                return self.parse_match_expr(sb)
            # function call or naked field reference
            if self.peek(1).kind == "OP" and self.peek(1).value == "(":
                self.next()
                args, kwargs = self.parse_args()
                return ("func", word, args, kwargs)
            self.next()
            if word in self.lambda_params:
                return ("context", ("named", word), [])
            return ("context", "this", [word])
        raise ParseError(
            f"unexpected token {t.kind}:{t.value!r} at line {t.line}")

    def parse_array_literal(self):
        self.expect_op("[")
        items = []
        self.skip_newlines()
        while not self.at_op("]"):
            items.append(self.parse_query())
            self.skip_newlines()
            if self.at_op(","):
                self.next()
                self.skip_newlines()
        self.expect_op("]")
        return ("arraylit", items)

    def parse_object_literal(self):
        self.expect_op("{")
        pairs = []
        self.skip_newlines()
        while not self.at_op("}"):
            key = self.parse_query()
            self.expect_op(":")
            self.skip_newlines()
            val = self.parse_query()
            pairs.append((key, val))
            self.skip_newlines()
            if self.at_op(","):
                self.next()
                self.skip_newlines()
        self.expect_op("}")
        return ("objectlit", pairs)

    def parse_if_expr(self):
        self.next()  # 'if'
        branches = []
        cond = self.parse_query(stop_at_brace=True)
        branches.append((cond, self._brace_query()))
        else_q = None
        while True:
            save = self.pos
            self.skip_newlines()
            t = self.peek()
            if t.kind == "IDENT" and t.value == "else":
                self.next()
                t2 = self.peek()
                if t2.kind == "IDENT" and t2.value == "if":
                    self.next()
                    cond = self.parse_query(stop_at_brace=True)
                    branches.append((cond, self._brace_query()))
                else:
                    else_q = self._brace_query()
                    break
            else:
                self.pos = save
                break
        return ("if", branches, else_q)

    def _brace_query(self):
        self.expect_op("{")
        self.skip_newlines()
        q = self.parse_query()
        self.skip_newlines()
        self.expect_op("}")
        return q

    def parse_match_expr(self, sb=False):
        self.next()  # 'match'
        operand = None
        self.skip_newlines()
        if not self.at_op("{"):
            operand = self.parse_query(stop_at_brace=True)
            self.skip_newlines()
        self.expect_op("{")
        self.skip_newlines()
        cases = []
        while not self.at_op("}"):
            if self.peek().kind == "UNDERSCORE":
                self.next()
                self._skip_nl_in_expr()
                self.expect_op("=>")
                self._skip_nl_in_expr()
                cases.append(("default", None, self.parse_query()))
            else:
                caseq = self.parse_query()
                self.expect_op("=>")
                self._skip_nl_in_expr()
                resq = self.parse_query()
                kind = "lit" if caseq[0] == "lit" or caseq[0] == "neg" and \
                    caseq[1][0] == "lit" else "bool"
                cases.append((kind, caseq, resq))
            self.skip_newlines()
            if self.at_op(","):
                self.next()
                self.skip_newlines()
        self.expect_op("}")
        return ("match", operand, cases)


def parse_mapping(src: str) -> list:
    return Parser(src).parse_mapping()


def parse_query(src: str):
    p = Parser(src)
    p.skip_newlines()
    q = p.parse_query()
    p.skip_newlines()
    t = p.peek()
    if t.kind != "EOF":
        raise ParseError(f"trailing input at line {t.line}: {t.value!r}")
    return q
