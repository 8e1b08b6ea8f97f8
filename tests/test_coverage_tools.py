"""Unit guards for the coverage tool's executable-content churn filter
and the parity re-proof ledger key (r13 verdict #3): the advisory must
ignore comment/docstring-only edits and the ledger fingerprint must
move exactly when executable content moves."""

from __future__ import annotations

from tools.coverage import exec_fingerprint


BASE = '''
"""Module docstring."""

def f(x):
    """f docstring."""
    # a comment
    return x + 1


class C:
    """C docstring."""

    def m(self):
        return 2
'''


def test_docstring_and_comment_edits_do_not_change_fp():
    cosmetically_edited = BASE.replace(
        '"""Module docstring."""', '"""A rewritten module docstring."""'
    ).replace('"""f docstring."""', '"""new words."""').replace(
        "# a comment", "# an entirely different comment"
    )
    assert exec_fingerprint(BASE) == exec_fingerprint(cosmetically_edited)


def test_code_edit_changes_fp():
    changed = BASE.replace("return x + 1", "return x + 2")
    assert exec_fingerprint(BASE) != exec_fingerprint(changed)


def test_docstring_only_body_keeps_valid_ast():
    src = 'def g():\n    """only a docstring."""\n'
    fp = exec_fingerprint(src)
    assert fp is not None
    # stripping must not change whether the function is otherwise empty
    assert fp == exec_fingerprint(
        'def g():\n    """different docstring."""\n'
    )
    assert fp == exec_fingerprint("def g():\n    pass\n")


def test_unparseable_returns_none():
    assert exec_fingerprint("def broken(:") is None
