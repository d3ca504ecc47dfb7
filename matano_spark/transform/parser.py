"""Parser: VRL-style transform program text → transform-DSL steps.

The reference's per-table transforms are VRL source strings embedded in
YAML (e.g. data/managed/log_sources/*/log_source.yml). This parser
covers the practical subset those programs use so matano-style config
can run here with the program text intact:

  .a.b = expr                  assignment (path creation)
  .a = del(.b.c)               move
  del(.a.b)                    delete
  abort                        skip row (inside if: conditional skip)
  if cond { steps } else if cond { steps } else { steps }
  fn(args..., name: value)     scalar calls (transform.functions)
  fn!(...)                     fallible marker (same builder; try_*)
  expr ?? expr                 error/null coalesce
  literals                     "str", 'str', 123, 1.5, true, false, null
  operators                    == != < <= > >= && || ! + - * / %
  string concat                "a" + .field

Verbatim-source constructs (the remaining managed-yml inventory):
  name = expr                  local variable (nested: a.b.c = expr)
  val, err = f(...)            error destructuring (`_` discards)
  for_each(coll) -> |i, v| {}  statement closure w/ outer mutation
  x = if c { stmts; expr }     block-expression if (VRL block value)
  .a |= expr                   object merge-assign
  set!(o, [k], v) get!(a, [i]) dynamic single-segment paths

Deliberately out of scope: `%`-metadata paths, dynamic path indexing
on row paths (`.a[.b]`).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Any

from matano_spark.transform import ast

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+|\#[^\n]*)
  | (?P<string>"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*')
  | (?P<float>\d+\.\d+)
  | (?P<int>\d+)
  | (?P<op>\?\?|==|!=|<=|>=|&&|\|\||\|=|->|[=<>!+\-*/%(),{}:;|\[\]])
  | (?P<path>\.(?:"[^"]+"|[A-Za-z_]\w*)(?:\.(?:"[^"]+"|[A-Za-z_]\w*))*|\.)
  | (?P<name>[A-Za-z_][\w]*!?)
    """,
    re.VERBOSE,
)

KEYWORDS = {"if", "else", "abort", "true", "false", "null", "del"}


@dataclass
class Tok:
    kind: str
    text: str
    pos: int


def tokenize(src: str) -> list[Tok]:
    out: list[Tok] = []
    pos = 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m:
            raise SyntaxError(f"bad character {src[pos]!r} at {pos}")
        kind = m.lastgroup
        text = m.group()
        if kind != "ws":
            out.append(Tok(kind, text, pos))
        pos = m.end()
    out.append(Tok("eof", "", pos))
    return out


class Parser:
    def __init__(self, src: str):
        self.toks = tokenize(src)
        self.i = 0

    # -- token helpers ------------------------------------------------
    def peek(self) -> Tok:
        return self.toks[self.i]

    def next(self) -> Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    def accept(self, text: str) -> bool:
        if self.peek().text == text:
            self.i += 1
            return True
        return False

    def expect(self, text: str) -> Tok:
        t = self.next()
        if t.text != text:
            raise SyntaxError(f"expected {text!r}, got {t.text!r} at {t.pos}")
        return t

    # -- program ------------------------------------------------------
    def parse_program(self) -> list[ast.Step]:
        steps: list[ast.Step] = []
        while self.peek().kind != "eof" and self.peek().text != "}":
            save = self.i
            try:
                steps.append(self.parse_step())
            except SyntaxError:
                # bare expression statement (VRL evaluates + discards;
                # a PROGRAM-trailing one is the program's return value,
                # e.g. select_table_from_payload's table-name result)
                self.i = save
                steps.append(ast.ExprStmt(self.parse_expr()))
            while self.accept(";"):
                pass
        return steps

    def parse_step(self) -> ast.Step:
        t = self.peek()
        if t.text == "if":
            return self.parse_if()
        if t.text == "abort":
            self.next()
            return ast.AbortIf(ast.L(True))
        if t.text == "del":
            self.next()
            self.expect("(")
            if self.peek().kind == "name":  # del(local_var[.path])
                name = self.next().text
                if (
                    self.peek().kind == "path"
                    and self.peek().pos == self.toks[self.i - 1].pos + len(name)
                ):
                    name += "." + self.next().text.lstrip(".")
                self.expect(")")
                return ast.Delete(name, var=True)
            path = self.expect_path()
            self.expect(")")
            return ast.Delete(path)
        if t.kind == "path":
            path = self.next().text.lstrip(".")
            if self.accept("|="):  # merge-assign (.url |= parsed)
                return ast.Assign(
                    path, ast.Fn("merge", ast.P(path), self.parse_expr())
                )
            if self.peek().text == ",":
                # row-path error destructuring: .p, err = f(...)
                self.next()
                err = self.next().text
                self.expect("=")
                err_name = None if err == "_" else err
                return self._assign_rhs(
                    lambda e: ast.LetErr(path, err_name, e, val_row=True)
                )
            self.expect("=")
            # chained assignment: .a = .b = expr (both get the value)
            if (
                self.peek().kind == "path"
                and self.toks[self.i + 1].text == "="
            ):
                inner = self.parse_step()
                return ast.Multi((inner, ast.Assign(path, ast.P(_chain_target(inner)))))
            # move form: .a = del(.b) / .a = del(local.field)
            dm = self._try_del_move()
            if dm is not None:
                read, delstep = dm
                if isinstance(read, ast.P):
                    return ast.Move(path, read.path)
                return ast.Multi((ast.Assign(path, read), delstep))
            return self._assign_rhs(lambda e: ast.Assign(path, e))
        if t.kind == "name" and t.text not in KEYWORDS:
            nxt = self.toks[self.i + 1]
            if t.text == "for_each" and nxt.text == "(":
                return self.parse_for_each()
            if nxt.text == "=":
                name = self.next().text
                self.expect("=")
                dm = self._try_del_move()
                if dm is not None:
                    read, delstep = dm
                    return ast.Multi((ast.LetVar(name, read), delstep))
                return self._assign_rhs(lambda e: ast.LetVar(name, e))
            if (
                nxt.kind == "path"
                and nxt.pos == t.pos + len(t.text)  # adjacency: x.y, not x \n .y
                and self.toks[self.i + 2].text == "="
                and self.toks[self.i + 3].text != "="
            ):
                # nested local write: debug_data.flattened.risk = expr
                name = self.next().text
                sub = self.next().text.lstrip(".")
                self.expect("=")
                dm = self._try_del_move()
                if dm is not None:
                    read, delstep = dm
                    return ast.Multi(
                        (ast.LetVar(f"{name}.{sub}", read), delstep)
                    )
                return self._assign_rhs(
                    lambda e: ast.LetVar(f"{name}.{sub}", e)
                )
            if nxt.text == "|=":
                name = self.next().text
                self.next()
                return ast.LetVar(
                    name, ast.Fn("merge", ast.Var(name), self.parse_expr())
                )
            if nxt.text == ",":
                # error destructuring: val, err = f(...)
                name = self.next().text
                self.expect(",")
                err = self.next().text
                self.expect("=")
                val_name = None if name == "_" else name
                err_name = None if err == "_" else err
                return self._assign_rhs(
                    lambda e: ast.LetErr(val_name, err_name, e)
                )
        raise SyntaxError(f"unexpected {t.text!r} at {t.pos}")

    def _try_del_move(self) -> tuple | None:
        """RHS of the exact shape `del(target)` with nothing after it:
        returns (read_expr, delete_step) — the VRL move idiom removes
        the source while yielding its value. None if the RHS is
        anything else (del-within-expression keeps read-only
        semantics)."""
        if self.peek().text != "del":
            return None
        save = self.i
        self.next()
        if not self.accept("("):
            self.i = save
            return None
        if self.peek().kind == "name":
            nm = self.next().text
            sub = None
            if (
                self.peek().kind == "path"
                and self.peek().pos == self.toks[self.i - 1].pos + len(nm)
            ):
                sub = self.next().text.lstrip(".")
            if not self.accept(")") or self.peek().text in ("??", "[") or (
                self._is_expr_continuation()
            ):
                self.i = save
                return None
            read = (
                ast.Fn("__field", ast.Var(nm), path=sub) if sub else ast.Var(nm)
            )
            target = f"{nm}.{sub}" if sub else nm
            return read, ast.Delete(target, var=True)
        if self.peek().kind == "path":
            p = self.expect_path()
            if not self.accept(")") or self.peek().text in ("??", "[") or (
                self._is_expr_continuation()
            ):
                self.i = save
                return None
            return ast.P(p), ast.Delete(p)
        self.i = save
        return None

    def _assign_rhs(self, mk) -> ast.Step:
        """RHS of an assignment: a block-expression if desugars to a
        When whose branches end by assigning the target."""
        if self.peek().text == "if":
            return self.parse_if_expr_into(mk)
        return mk(self.parse_expr())

    def parse_for_each(self) -> ast.ForEach:
        self.expect("for_each")
        self.expect("(")
        coll = self.parse_expr()
        self.expect(")")
        self.expect("->")
        self.expect("|")
        params = [self.next().text]
        while self.accept(","):
            params.append(self.next().text)
        self.expect("|")
        self.expect("{")
        body = self.parse_program()
        self.expect("}")
        return ast.ForEach(coll, params, body)

    def parse_if_expr_into(self, mk) -> ast.Step:
        """`target = if c { stmts; expr } else { ... }` — VRL blocks
        are expressions valued at their last statement/expression;
        desugared so each branch runs its statements then assigns the
        branch value to the target."""
        self.expect("if")
        cond = self.parse_expr()
        self.expect("{")
        steps, final = self.parse_block_value()
        self.expect("}")
        then_steps = steps + (mk(final),)
        orelse: tuple = ()
        if self.accept("else"):
            if self.peek().text == "if":
                orelse = (self.parse_if_expr_into(mk),)
            else:
                self.expect("{")
                esteps, efinal = self.parse_block_value()
                self.expect("}")
                orelse = esteps + (mk(efinal),)
        return ast.When(cond, then_steps, orelse)

    def parse_block_value(self):
        """Statements of a value-block, plus the block's value
        expression. Backtracking split: whatever fails to parse as a
        statement is the trailing expression; a block ending on an
        assignment is valued at the assigned target (VRL statement
        value)."""
        steps: list[ast.Step] = []
        while True:
            if self.peek().text == "}":
                last = steps[-1] if steps else None
                if isinstance(last, ast.Assign):
                    return tuple(steps), ast.P(last.path)
                if isinstance(last, ast.LetVar):
                    return tuple(steps), _var_read(last.path)
                if isinstance(last, ast.ExprStmt):
                    steps.pop()
                    return tuple(steps), last.expr
                if isinstance(last, ast.Delete):
                    # trailing `del(x)` is the block's VALUE (VRL del
                    # returns the deleted value — aws_waf's
                    # `if .s != "-" { del(.json.s) } else { null }`):
                    # capture before deleting, value the capture
                    tmp = f"__delval_{self.i}"
                    if last.var:
                        nm, _, sub = last.path.partition(".")
                        read = (
                            ast.Fn("__field", ast.Var(nm), path=sub)
                            if sub
                            else ast.Var(nm)
                        )
                    else:
                        read = ast.P(last.path)
                    steps[-1:] = [ast.LetVar(tmp, read), last]
                    return tuple(steps), ast.Var(tmp)
                # statement block (trailing abort/...): value is null
                return tuple(steps), ast.L(None)
            if self.peek().text == "if":
                # an if ENDING the block may be the block's VALUE
                # (if-expression chain) — try that reading first; a
                # mutating statement-if fails it and falls through
                save = self.i
                try:
                    e = self.parse_closure_body()
                    if self.peek().text == "}":
                        return tuple(steps), e
                except SyntaxError:
                    pass
                self.i = save
            save = self.i
            try:
                steps.append(self.parse_step())
            except SyntaxError:
                self.i = save
                return tuple(steps), self.parse_expr()

    def _is_expr_continuation(self) -> bool:
        return self.peek().text in ("+", "-", "*", "/", "%", "==", "!=",
                                     "<", "<=", ">", ">=", "&&", "||")

    def parse_if(self) -> ast.When:
        self.expect("if")
        cond = self.parse_expr()
        self.expect("{")
        steps = self.parse_program()
        self.expect("}")
        orelse: tuple = ()
        if self.accept("else"):
            if self.peek().text == "if":
                orelse = (self.parse_if(),)
            else:
                self.expect("{")
                orelse = tuple(self.parse_program())
                self.expect("}")
        # `abort` inside an if means conditional row skip. A bare abort
        # (cond == L(True)) takes the if-condition; a nested conditional
        # abort (from an inner `if B { abort }`, already collapsed to
        # AbortIf(B)) keeps its own condition ANDed with ours — rewriting
        # it to AbortIf(cond) would silently drop every row where the
        # outer condition holds.
        def _abort_cond(s: ast.AbortIf):
            if isinstance(s.cond, ast.L) and s.cond.value is True:
                return cond
            return ast.BinOp("&", cond, s.cond)

        steps2 = tuple(
            ast.AbortIf(_abort_cond(s)) if isinstance(s, ast.AbortIf) else s
            for s in steps
        )
        if len(steps2) == 1 and isinstance(steps2[0], ast.AbortIf) and not orelse:
            return steps2[0]
        return ast.When(cond, steps2, orelse)

    def expect_path(self) -> str:
        t = self.next()
        if t.kind != "path":
            raise SyntaxError(f"expected path, got {t.text!r} at {t.pos}")
        return t.text.lstrip(".")

    # -- expressions (precedence climbing) -----------------------------
    def parse_expr(self) -> Any:
        return self.parse_coalesce()

    def parse_coalesce(self) -> Any:
        left = self.parse_or()
        while self.accept("??"):
            right = self.parse_or()
            left = ast.Fn("coalesce", left, right)
        return left

    def parse_or(self) -> Any:
        left = self.parse_and()
        while self.accept("||"):
            left = ast.BinOp("|", left, self.parse_and())
        return left

    def parse_and(self) -> Any:
        left = self.parse_cmp()
        while self.accept("&&"):
            left = ast.BinOp("&", left, self.parse_cmp())
        return left

    def parse_cmp(self) -> Any:
        left = self.parse_add()
        while self.peek().text in ("==", "!=", "<", "<=", ">", ">="):
            op = self.next().text
            left = ast.BinOp(op, left, self.parse_add())
        return left

    def parse_add(self) -> Any:
        left = self.parse_mul()
        while self.peek().text in ("+", "-"):
            op = self.next().text
            right = self.parse_mul()
            left = ast.Fn("concat_or_add", left, right) if op == "+" else ast.BinOp(
                "-", left, right
            )
        return left

    def parse_mul(self) -> Any:
        left = self.parse_unary()
        while self.peek().text in ("*", "/", "%"):
            op = self.next().text
            left = ast.BinOp(op, left, self.parse_unary())
        return left

    def parse_unary(self) -> Any:
        if self.accept("!"):
            return ast.UnaryOp("!", self.parse_unary())
        if self.accept("-"):
            operand = self.parse_unary()
            return ast.BinOp("-", ast.L(0), operand)
        e = self.parse_atom()
        # postfix chain: constant index expr[0] / expr[-1], and
        # ADJACENT member access after it (authz_info[0].granted)
        while True:
            if self.peek().text == "[" and self.toks[self.i + 1].kind in (
                "int",
                "op",
            ):
                save = self.i
                self.next()  # [
                neg = self.accept("-")
                t = self.peek()
                if t.kind != "int":
                    self.i = save  # not an index (list literal) — back off
                    break
                idx = int(self.next().text)
                self.expect("]")
                e = ast.Fn("get", e, index=(-idx if neg else idx))
                continue
            prev = self.toks[self.i - 1]
            if (
                self.peek().kind == "path"
                and self.peek().pos == prev.pos + len(prev.text)
            ):
                p = self.next().text.lstrip(".")
                e = ast.Fn("get", e, path=list(ast.split_path(p)))
                continue
            break
        return e

    def parse_atom(self) -> Any:
        t = self.next()
        if t.kind == "string":
            return ast.L(_unquote(t.text))
        if t.kind == "int":
            return ast.L(int(t.text))
        if t.kind == "float":
            return ast.L(float(t.text))
        if t.kind == "path":
            return ast.P(t.text.lstrip("."))
        if t.text == "(":
            e = self.parse_expr()
            self.expect(")")
            return e
        if t.text == "{":
            # `?? { abort }` error-coalesce block: abort the row when
            # the left arm errors/nulls (S7 object-level abort shape)
            if self.peek().text == "abort":
                save = self.i
                self.next()
                if self.accept("}"):
                    return ast.Fn("__abort_block")
                self.i = save
            # object literal { "k": expr, ... } → __object(k1, v1, ...)
            save = self.i
            try:
                kvs: list[Any] = []
                while not self.accept("}"):
                    if kvs:
                        self.expect(",")
                        if self.accept("}"):  # trailing comma
                            break
                    kt = self.next()
                    key = _unquote(kt.text) if kt.kind == "string" else kt.text
                    self.expect(":")
                    kvs.append(ast.L(key))
                    # values may be expression-position if/else chains
                    kvs.append(self.parse_closure_body())
                return ast.Fn("__object", *kvs)
            except SyntaxError:
                self.i = save
            # value block `{ [stmts;] expr }` (zeek ssl nested-block
            # arms; cloudflare's `?? { ... }` fallback) — statements
            # are locals-only and run in an isolated scope
            steps, final = self.parse_block_value()
            self.expect("}")
            if steps:
                return ast.Fn(
                    "__stmt_block", fn=ast.Lambda((), final, steps)
                )
            return final
        if t.text == "[":
            # list literal: all-literal elements fold to ast.L(list)
            # (usable as raw kwarg values, e.g. parse_groks patterns);
            # otherwise compile as an __array call
            elems: list[Any] = []
            while not self.accept("]"):
                if elems:
                    self.expect(",")
                    if self.accept("]"):  # trailing comma
                        break
                elems.append(self.parse_expr())
            if all(isinstance(e, ast.L) for e in elems):
                return ast.L([e.value for e in elems])
            return ast.Fn("__array", *elems)
        if t.kind == "name":
            name = t.text
            # VRL regex literal r'...' / r"..." → marked pattern string.
            # RAW semantics: no escape processing — r'\\,' is the
            # 3-char regex source `\\,` (match literal backslash then
            # comma, zeek ssl's escaped-DN-comma strip), NOT `\,`
            if name == "r" and self.peek().kind == "string":
                return ast.L(ast.RegexLit(self.next().text[1:-1]))
            if name == "true":
                return ast.L(True)
            if name == "false":
                return ast.L(False)
            if name == "null":
                return ast.L(None)
            if name == "del":
                # expression-position del(.p): read + delete — the
                # compiler's Move handles statement form; here the
                # __del_read wrapper yields the value and QUEUES the
                # removal, flushed after the enclosing statement (true
                # VRL del semantics: cloudtrail digest's
                # `encode_json(compact(del(.aws.cloudtrail.digest)))`
                # must drop the subtree). Lazy `||`/`??` arms guard
                # the removal on the earlier arm being null.
                self.expect("(")
                if self.peek().kind == "name":  # del(local_var[.path])
                    nm = self.next().text
                    if (
                        self.peek().kind == "path"
                        and self.peek().pos
                        == self.toks[self.i - 1].pos + len(nm)
                    ):
                        sub = self.next().text.lstrip(".")
                        self.expect(")")
                        return ast.Fn(
                            "__del_read",
                            ast.Fn("__field", ast.Var(nm), path=sub),
                            target=f"{nm}.{sub}",
                            var=True,
                        )
                    self.expect(")")
                    return ast.Fn(
                        "__del_read", ast.Var(nm), target=nm, var=True
                    )
                p = self.expect_path()
                self.expect(")")
                return ast.Fn("__del_read", ast.P(p), target=p, var=False)
            fallible = name.endswith("!")
            fn_name = name.rstrip("!")
            if self.peek().text != "(":
                # bare identifier: a closure-bound variable (`v` inside
                # `-> |v| { ... }`); resolution happens at compile time.
                # `v.field.sub` member access compiles via __field —
                # ADJACENT only: a newline-separated `.path` starts the
                # next statement (`x = m` then `.related.y = ...`)
                if (
                    self.peek().kind == "path"
                    and self.peek().pos == t.pos + len(t.text)
                ):
                    p = self.next().text
                    return ast.Fn("__field", ast.Var(name), path=p.lstrip("."))
                return ast.Var(name)
            self.expect("(")
            args: list[Any] = []
            kwargs: dict[str, Any] = {}
            while not self.accept(")"):
                if args or kwargs:
                    self.expect(",")
                    if self.accept(")"):  # trailing comma
                        break
                # named arg?  name ':' expr
                if (
                    self.peek().kind == "name"
                    and self.toks[self.i + 1].text == ":"
                ):
                    key = self.next().text
                    self.expect(":")
                    val = self.parse_expr()
                    kwargs[key] = _lit_value(val)
                else:
                    args.append(self.parse_expr())
            _ = fallible  # fallible and infallible map to the same builder
            if self.peek().text == "->":
                kwargs["fn"] = self.parse_closure()
            return ast.Fn(fn_name, *args, **kwargs)
        raise SyntaxError(f"unexpected {t.text!r} at {t.pos}")

    def parse_closure(self) -> ast.Lambda:
        """`-> |v| { body }` / `-> |k, v| { body }`; body is an
        expression, a VRL if-ELSE-expression chain (every branch
        yields a value → Fn('ternary', ...)), or a STATEMENT block
        ending in a value (param-field rebuild closures)."""
        self.expect("->")
        self.expect("|")
        params = [self.next().text]
        while self.accept(","):
            params.append(self.next().text)
        self.expect("|")
        self.expect("{")
        save = self.i
        try:
            body = self.parse_closure_body()
            if self.peek().text == "}":
                self.next()
                return ast.Lambda(params, body)
        except SyntaxError:
            pass
        self.i = save
        steps, final = self.parse_block_value()
        self.expect("}")
        return ast.Lambda(params, final, steps=steps)

    def parse_closure_body(self) -> Any:
        if self.peek().text == "if":
            self.next()
            cond = self.parse_expr()
            self.expect("{")
            then = self.parse_closure_body()
            self.expect("}")
            # expression-position if WITHOUT else yields null (VRL)
            if self.accept("else"):
                if self.peek().text == "if":
                    orelse = self.parse_closure_body()
                else:
                    self.expect("{")
                    orelse = self.parse_closure_body()
                    self.expect("}")
            else:
                orelse = ast.L(None)
            return ast.Fn("ternary", cond, then, orelse)
        return self.parse_expr()


def _chain_target(step: ast.Step) -> str:
    """Target path of the inner step of a chained assignment."""
    if isinstance(step, ast.Multi):
        step = step.steps[-1]
    if isinstance(step, ast.Assign):
        return step.path
    if isinstance(step, ast.Move):
        return step.dst
    raise SyntaxError("unsupported chained assignment target")


def _var_read(path: str) -> Any:
    """Read expression for a local-variable path."""
    if "." in path:
        head, rest = path.split(".", 1)
        return ast.Fn("__field", ast.Var(head), path=rest)
    return ast.Var(path)


def _unquote(s: str) -> str:
    body = s[1:-1]
    return body.replace('\\"', '"').replace("\\'", "'").replace("\\n", "\n").replace(
        "\\\\", "\\"
    )


def _lit_value(e: Any) -> Any:
    """Named args carry python values (patterns, units, separators).
    All-literal object literals fold to dicts (pattern_definitions)."""
    if isinstance(e, ast.L):
        return e.value
    if (
        isinstance(e, ast.Fn)
        and e.name == "__object"
        and all(isinstance(x, ast.L) for x in e.args)
    ):
        vals = [x.value for x in e.args]
        return dict(zip(vals[0::2], vals[1::2]))
    # fold negative number literals (parse_unary desugars -n to 0 - n)
    if (
        isinstance(e, ast.BinOp)
        and e.op == "-"
        and isinstance(e.left, ast.L)
        and e.left.value == 0
        and isinstance(e.right, ast.L)
        and isinstance(e.right.value, (int, float))
    ):
        return -e.right.value
    return e


def _when_as_expr(w: ast.When):
    """A When whose branches are single pure expressions (an
    if/else-if routing chain) read back as a ternary; None if any
    branch is a real statement."""

    def branch(steps):
        if len(steps) == 1 and isinstance(steps[0], ast.ExprStmt):
            return steps[0].expr
        if len(steps) == 1 and isinstance(steps[0], ast.When):
            return _when_as_expr(steps[0])
        return None

    t = branch(list(w.steps))
    o = branch(list(w.orelse)) if w.orelse else ast.L(None)
    if t is None or o is None:
        return None
    return ast.Fn("ternary", w.cond, t, o)


def parse_program(src: str) -> list[ast.Step]:
    steps = Parser(src).parse_program()
    # a trailing bare expression is the PROGRAM's return value (VRL
    # expression programs, e.g. select_table_from_payload) — nested
    # blocks (for_each bodies, if arms) keep theirs as no-op ExprStmt.
    # A trailing pure if/else-if chain (cloudtrail's key routing) is
    # the same thing in statement clothing.
    if steps and isinstance(steps[-1], ast.ExprStmt):
        steps[-1] = ast.Assign("__vrl_result", steps[-1].expr)
    elif steps and isinstance(steps[-1], ast.When):
        e = _when_as_expr(steps[-1])
        if e is not None:
            steps[-1] = ast.Assign("__vrl_result", e)
    return steps


def compile_vrl(src: str):
    """VRL-ish text → DataFrame transformation."""
    from matano_spark.transform.compiler import compile_pipeline

    return compile_pipeline(parse_program(src))
