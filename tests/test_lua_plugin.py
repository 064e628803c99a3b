"""darktable Lua plugin (lua-scripts/nind_denoise_tpu_rl.lua) regression
gates — no Lua interpreter ships in this image, so the always-on checks are
structural (source-level) plus a cross-component check that every CLI flag
the plugin emits exists on the real pipeline CLI; ``luac -p`` / ``lua``
syntax validation auto-activates when an interpreter is present.

Reference behavior being pinned: the 43-name substitution vocabulary and
its positional value mapping
(/root/reference/src/lua-scripts/nind_denoise_rl.lua:111-116 placeholders,
:247-304 replacements) and the store-hook CLI invocation (:330-465).
"""

import os
import re
import shutil
import subprocess

import pytest

LUA_PATH = os.path.join(os.path.dirname(__file__), "..", "lua-scripts",
                        "nind_denoise_tpu_rl.lua")

# The reference plugin's vocabulary, verbatim order (nind_denoise_rl.lua:
# 111-116). Order matters: the map is built positionally against the
# values list, so an insertion anywhere silently shifts every later
# placeholder onto the wrong value.
REFERENCE_PLACEHOLDERS = [
    "ROLL_NAME", "FILE_FOLDER", "FILE_NAME", "FILE_EXTENSION", "ID",
    "VERSION", "SEQUENCE", "YEAR", "MONTH", "DAY", "HOUR", "MINUTE",
    "SECOND", "EXIF_YEAR", "EXIF_MONTH", "EXIF_DAY", "EXIF_HOUR",
    "EXIF_MINUTE", "EXIF_SECOND", "STARS", "LABELS", "MAKER", "MODEL",
    "TITLE", "CREATOR", "PUBLISHER", "RIGHTS", "USERNAME",
    "PICTURES_FOLDER", "HOME", "DESKTOP", "EXIF_ISO", "EXIF_EXPOSURE",
    "EXIF_EXPOSURE_BIAS", "EXIF_APERTURE", "EXIF_FOCUS_DISTANCE",
    "EXIF_FOCAL_LENGTH", "LONGITUDE", "LATITUDE", "ELEVATION", "LENS",
    "DESCRIPTION", "EXIF_CROP",
]


@pytest.fixture(scope="module")
def lua_src():
    with open(LUA_PATH) as f:
        return f.read()


def _extract_table(src: str, name: str) -> str:
    """Source text of ``local NAME = { ... }`` (brace-balanced)."""
    m = re.search(rf"local {name}\s*=\s*\{{", src)
    assert m, f"table {name} not found"
    depth, i = 1, m.end()
    while depth:
        c = src[i]
        if c == "{":
            depth += 1
        elif c == "}":
            depth -= 1
        i += 1
    return src[m.end():i - 1]


def _top_level_commas(body: str) -> int:
    """Count top-level entries of a Lua table/list body: commas at paren/
    brace/string depth zero (enough for this file's expression grammar)."""
    depth, entries, in_str, quote, has_tok = 0, 0, False, "", False
    i = 0
    while i < len(body):
        c = body[i]
        if in_str:
            if c == "\\":
                i += 2
                continue
            if c == quote:
                in_str = False
        elif c in "\"'":
            in_str, quote = True, c
        elif c in "({[":
            depth += 1
        elif c in ")}]":
            depth -= 1
        elif c == "," and depth == 0:
            entries += 1
            has_tok = False
        elif not c.isspace():
            has_tok = True
        i += 1
    return entries + (1 if has_tok else 0)


def test_placeholder_vocabulary_matches_reference(lua_src):
    body = _extract_table(lua_src, "PLACEHOLDERS")
    names = re.findall(r'"([A-Z_]+)"', body)
    assert names == REFERENCE_PLACEHOLDERS
    assert len(names) == 43


def test_substitution_values_align_positionally(lua_src):
    """map[PLACEHOLDERS[i]] = values[i] — the values list must have exactly
    as many top-level entries as there are placeholder names, or every
    entry after the mismatch binds to the wrong variable."""
    m = re.search(r"local values\s*=\s*\{", lua_src)
    assert m, "values table not found"
    depth, i = 1, m.end()
    while depth:
        c = lua_src[i]
        if c == "{":
            depth += 1
        elif c == "}":
            depth -= 1
        i += 1
    body = lua_src[m.end():i - 1]
    assert _top_level_commas(body) == len(REFERENCE_PLACEHOLDERS)


def test_cli_flags_emitted_by_plugin_exist_on_real_cli(lua_src):
    """The store hook shells out to the pipeline CLI; every long flag in
    its command template must exist on pipeline/denoise_cli.py's parser so
    plugin/CLI drift cannot land silently."""
    from nind_denoise_tpu.pipeline.denoise_cli import build_parser

    known = set(build_parser()._option_string_actions)
    m = re.search(r"string\.format\(\s*'([^']*)'", lua_src)
    assert m, "CLI command template not found"
    template = m.group(1)
    flags = re.findall(r"(--[a-z0-9_-]+|\s-[a-z]\b)", template)
    assert flags, "no flags parsed from the template"
    for fl in flags:
        assert fl.strip() in known, f"plugin emits unknown CLI flag {fl!r}"
    # the conditional deblur flag lives outside the template string
    assert "--no_deblur" in lua_src and "--no_deblur" in known


def test_structural_balance(lua_src):
    """Cheap syntax smoke without an interpreter: balanced parens/braces/
    brackets outside strings and comments, no unterminated strings, and
    block keywords (function/if/for/while/do) matched by ``end``."""
    depth = {"(": 0, "{": 0, "[": 0}
    closer = {")": "(", "}": "{", "]": "["}
    i, n = 0, len(lua_src)
    blocks = 0
    # 'elseif ... then' continues an existing if-block (ONE end closes the
    # whole chain), so its 'then' must not count as a new opener (ADVICE r4)
    pending_elseif = False

    def long_bracket(at: int):
        # Lua long-bracket form [=*[ ... ]=*] (strings and --[==[ comments)
        m = re.match(r"\[(=*)\[", lua_src[at:])
        if not m:
            return None
        close = "]" + m.group(1) + "]"
        j = lua_src.find(close, at + m.end())
        assert j != -1, f"unterminated long bracket at byte {at}"
        return j + len(close)

    while i < n:
        c = lua_src[i]
        if lua_src.startswith("--", i):
            j = long_bracket(i + 2)  # long comment --[[ / --[==[
            if j is not None:
                i = j
                continue
            i = lua_src.find("\n", i)  # line comment
            i = n if i == -1 else i
            continue
        if c == "[":
            j = long_bracket(i)  # long STRING [[...]] — not brackets
            if j is not None:
                i = j
                continue
        if c in "\"'":
            j = i + 1
            while j < n and lua_src[j] != c:
                j += 2 if lua_src[j] == "\\" else 1
            assert j < n, "unterminated string"
            i = j + 1
            continue
        if c in depth:
            depth[c] += 1
        elif c in closer:
            depth[closer[c]] -= 1
            assert depth[closer[c]] >= 0, f"unbalanced {c} at byte {i}"
        m = re.match(r"\b(function|elseif|then|do|end)\b", lua_src[i:i + 9])
        if m and (i == 0 or not (lua_src[i - 1].isalnum()
                                 or lua_src[i - 1] == "_")):
            kw = m.group(1)
            if kw == "end":
                blocks -= 1
                assert blocks >= 0, f"stray end at byte {i}"
            elif kw == "elseif":
                pending_elseif = True
            elif kw == "do":
                # for/while headers end in do; standalone do opens a block
                blocks += 1
            elif kw == "then":
                if not pending_elseif:
                    blocks += 1
                pending_elseif = False
            elif kw == "function":
                blocks += 1
            i += len(kw)
            continue
        i += 1
    assert all(v == 0 for v in depth.values()), f"unbalanced brackets {depth}"
    assert blocks == 0, f"{blocks} unclosed block(s)"


def test_lua_syntax_when_interpreter_available(tmp_path):
    """Auto-activating real syntax gate: luac -p (or lua loadfile) parses
    the plugin when an interpreter exists in the environment."""
    luac = (shutil.which("luac") or shutil.which("luac5.4")
            or shutil.which("luac5.3") or shutil.which("luac5.1"))
    lua = (shutil.which("lua") or shutil.which("lua5.4")
           or shutil.which("lua5.3") or shutil.which("lua5.1"))
    if luac:
        r = subprocess.run([luac, "-p", LUA_PATH], capture_output=True,
                           text=True)
        assert r.returncode == 0, r.stderr
    elif lua:
        r = subprocess.run(
            [lua, "-e", f'assert(loadfile("{LUA_PATH}"))'],
            capture_output=True, text=True)
        assert r.returncode == 0, r.stderr
    else:
        pytest.skip("no lua interpreter in this image")
