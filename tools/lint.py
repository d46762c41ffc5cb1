"""In-repo static checker — the lint tier of the build.

The reference gates CI on flake8/isort/mypy/cpplint (reference
``Makefile:60-106``); none of those tools exist in this hermetic image,
so this module implements the highest-value checks directly on the stdlib
``ast``/``tokenize`` so `make lint` is a real gate, not a stub:

  F401  unused import
  F811  redefinition of an unused import
  F601  duplicate dict literal key
  E501  line too long (> 80 columns)
  E999  syntax error
  W291  trailing whitespace
  W191  tab indentation
  B006  mutable default argument
  E722  bare except
  D100  missing module docstring (package modules only)

Suppression: a ``# noqa`` comment on the flagged line, or ``# noqa: CODE``
for a specific code. Exit status 1 if any finding survives.
"""

import ast
import sys
import tokenize
from pathlib import Path
from typing import Dict, List, Set, Tuple

MAX_LINE = 80
ROOTS = ["envpool_tpu", "tests", "examples", "benchmark", "tools"]
TOP_FILES = ["bench.py", "entry_check.py", "__graft_entry__.py"]

Finding = Tuple[str, int, str, str]  # path, line, code, message


def _noqa_lines(path: Path) -> Dict[int, Set[str]]:
  """Map line -> set of suppressed codes ('' = all) from noqa comments."""
  out: Dict[int, Set[str]] = {}
  try:
    with tokenize.open(path) as f:
      tokens = tokenize.generate_tokens(f.readline)
      for tok in tokens:
        if tok.type == tokenize.COMMENT and "noqa" in tok.string:
          comment = tok.string.split("noqa", 1)[1]
          if comment.startswith(":"):
            codes = set()
            for chunk in comment[1:].split(","):
              word = chunk.strip().split()
              if word and word[0].isalnum():
                codes.add(word[0])
            codes = codes or {""}
          else:
            codes = {""}
          out.setdefault(tok.start[0], set()).update(codes)
  except (tokenize.TokenizeError, SyntaxError):
    pass
  return out


class _ImportVisitor(ast.NodeVisitor):
  """Collect imported bindings and every name/attribute usage."""

  def __init__(self) -> None:
    # name -> (line, qualified source) of the LAST binding import
    self.imports: Dict[str, Tuple[int, str]] = {}
    self.redefs: List[Tuple[str, int]] = []
    self.used: Set[str] = set()

  def _bind(self, name: str, line: int, src: str) -> None:
    if name in self.imports and name not in self.used:
      self.redefs.append((name, line))
    self.imports[name] = (line, src)

  def visit_Import(self, node: ast.Import) -> None:
    for a in node.names:
      if a.asname is None and "." in a.name:
        continue  # `import a.b.c` = side-effect submodule import
      self._bind(a.asname or a.name, node.lineno, a.name)

  def visit_ImportFrom(self, node: ast.ImportFrom) -> None:
    if node.module == "__future__":
      return  # compiler directives, not bindings
    for a in node.names:
      if a.name == "*":
        continue
      name = a.asname or a.name
      self._bind(name, node.lineno, f"{node.module}.{a.name}")

  def visit_Name(self, node: ast.Name) -> None:
    if isinstance(node.ctx, ast.Load):
      self.used.add(node.id)
    self.generic_visit(node)

  def visit_Attribute(self, node: ast.Attribute) -> None:
    self.generic_visit(node)


def _string_names(tree: ast.Module) -> Set[str]:
  """Names referenced via __all__ strings or globals()[...] patterns."""
  out: Set[str] = set()
  for node in ast.walk(tree):
    if isinstance(node, ast.Constant) and isinstance(node.value, str):
      if node.value.isidentifier():
        out.add(node.value)
  return out


def check_file(path: Path) -> List[Finding]:
  findings: List[Finding] = []
  try:
    text = path.read_text()
  except UnicodeDecodeError:
    return [(str(path), 0, "E999", "undecodable file")]

  lines = text.splitlines()
  for i, line in enumerate(lines, 1):
    if len(line) > MAX_LINE:
      findings.append((str(path), i, "E501",
                       f"line too long ({len(line)} > {MAX_LINE})"))
    if line != line.rstrip():
      findings.append((str(path), i, "W291", "trailing whitespace"))
    if line.startswith("\t") or (line[:1] == " " and "\t" in
                                 line[:len(line) - len(line.lstrip())]):
      findings.append((str(path), i, "W191", "tab indentation"))

  try:
    tree = ast.parse(text, filename=str(path))
  except SyntaxError as e:
    findings.append(
      (str(path), e.lineno or 0, "E999", f"syntax error: {e.msg}")
    )
    return findings

  # D100: package modules should carry a docstring
  if path.parts[0] == "envpool_tpu" and path.name != "__init__.py":
    if not (tree.body and isinstance(tree.body[0], ast.Expr)
            and isinstance(tree.body[0].value, ast.Constant)
            and isinstance(tree.body[0].value.value, str)):
      findings.append((str(path), 1, "D100", "missing module docstring"))

  iv = _ImportVisitor()
  iv.visit(tree)
  referenced = iv.used | _string_names(tree)
  for name, (line, src) in iv.imports.items():
    if name not in referenced:
      findings.append((str(path), line, "F401",
                       f"'{src}' imported but unused"))
  for name, line in iv.redefs:
    findings.append((str(path), line, "F811",
                     f"redefinition of unused '{name}'"))

  for node in ast.walk(tree):
    if isinstance(node, ast.Dict):
      seen: Set[object] = set()
      for k in node.keys:
        if isinstance(k, ast.Constant):
          try:
            if k.value in seen:
              findings.append((str(path), k.lineno, "F601",
                               f"duplicate dict key {k.value!r}"))
            seen.add(k.value)
          except TypeError:
            pass
    elif isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
      for default in node.args.defaults + node.args.kw_defaults:
        if isinstance(default, (ast.List, ast.Dict, ast.Set)):
          findings.append((str(path), default.lineno, "B006",
                           "mutable default argument"))
    elif isinstance(node, ast.ExceptHandler) and node.type is None:
      findings.append((str(path), node.lineno, "E722", "bare 'except:'"))

  noqa = _noqa_lines(path)
  return [
    f for f in findings
    if not (f[1] in noqa and ("" in noqa[f[1]] or f[2] in noqa[f[1]]))
  ]


def main() -> int:
  repo = Path(__file__).resolve().parent.parent
  files: List[Path] = []
  for root in ROOTS:
    d = repo / root
    if d.is_dir():
      files.extend(sorted(d.rglob("*.py")))
  for f in TOP_FILES:
    p = repo / f
    if p.exists():
      files.append(p)

  all_findings: List[Finding] = []
  for path in files:
    all_findings.extend(check_file(path.relative_to(repo)
                                   if path.is_absolute() else path))
  for path, line, code, msg in all_findings:
    print(f"{path}:{line}: {code} {msg}")
  print(f"# {len(files)} files checked, {len(all_findings)} findings",
        file=sys.stderr)
  return 1 if all_findings else 0


if __name__ == "__main__":
  sys.exit(main())
