"""PathHierarchyTokenizer vectors — every TestPathHierarchyTokenizer
and TestReversePathHierarchyTokenizer case (texts, offsets, position
increments)."""

from lucene_spark.analysis.pathhierarchy import (
    path_hierarchy_tokens, reverse_path_hierarchy_tokens)


def tok(ts):
    return ([t.text for t in ts], [t.start for t in ts],
            [t.end for t in ts], [t.position_increment for t in ts])


def test_basic():
    assert tok(path_hierarchy_tokens("/a/b/c")) == (
        ["/a", "/a/b", "/a/b/c"], [0, 0, 0], [2, 4, 6], [1, 0, 0])


def test_end_of_delimiter():
    assert tok(path_hierarchy_tokens("/a/b/c/")) == (
        ["/a", "/a/b", "/a/b/c", "/a/b/c/"], [0, 0, 0, 0],
        [2, 4, 6, 7], [1, 0, 0, 0])


def test_start_of_char():
    assert tok(path_hierarchy_tokens("a/b/c")) == (
        ["a", "a/b", "a/b/c"], [0, 0, 0], [1, 3, 5], [1, 0, 0])


def test_start_of_char_end_of_delimiter():
    assert tok(path_hierarchy_tokens("a/b/c/")) == (
        ["a", "a/b", "a/b/c", "a/b/c/"], [0, 0, 0, 0],
        [1, 3, 5, 6], [1, 0, 0, 0])


def test_only_delimiter():
    assert tok(path_hierarchy_tokens("/")) == (["/"], [0], [1], [1])


def test_only_delimiters():
    assert tok(path_hierarchy_tokens("//")) == (
        ["/", "//"], [0, 0], [1, 2], [1, 0])


def test_replace():
    assert tok(path_hierarchy_tokens("/a/b/c", "/", "\\")) == (
        ["\\a", "\\a\\b", "\\a\\b\\c"], [0, 0, 0], [2, 4, 6], [1, 0, 0])


def test_windows_path():
    assert tok(path_hierarchy_tokens("c:\\a\\b\\c", "\\", "\\")) == (
        ["c:", "c:\\a", "c:\\a\\b", "c:\\a\\b\\c"], [0, 0, 0, 0],
        [2, 4, 6, 8], [1, 0, 0, 0])


def test_basic_skip():
    assert tok(path_hierarchy_tokens("/a/b/c", skip=1)) == (
        ["/b", "/b/c"], [2, 2], [4, 6], [1, 0])


def test_end_of_delimiter_skip():
    assert tok(path_hierarchy_tokens("/a/b/c/", skip=1)) == (
        ["/b", "/b/c", "/b/c/"], [2, 2, 2], [4, 6, 7], [1, 0, 0])


def test_start_of_char_skip():
    assert tok(path_hierarchy_tokens("a/b/c", skip=1)) == (
        ["/b", "/b/c"], [1, 1], [3, 5], [1, 0])


def test_reverse_basic():
    assert tok(reverse_path_hierarchy_tokens("/a/b/c")) == (
        ["/a/b/c", "a/b/c", "b/c", "c"], [0, 1, 3, 5],
        [6, 6, 6, 6], [1, 0, 0, 0])


def test_reverse_end_of_delimiter():
    assert tok(reverse_path_hierarchy_tokens("/a/b/c/")) == (
        ["/a/b/c/", "a/b/c/", "b/c/", "c/"], [0, 1, 3, 5],
        [7, 7, 7, 7], [1, 0, 0, 0])


def test_reverse_start_of_char():
    assert tok(reverse_path_hierarchy_tokens("a/b/c")) == (
        ["a/b/c", "b/c", "c"], [0, 2, 4], [5, 5, 5], [1, 0, 0])


def test_reverse_start_of_char_end_of_delimiter():
    assert tok(reverse_path_hierarchy_tokens("a/b/c/")) == (
        ["a/b/c/", "b/c/", "c/"], [0, 2, 4], [6, 6, 6], [1, 0, 0])


def test_reverse_only_delimiter():
    assert tok(reverse_path_hierarchy_tokens("/")) == (
        ["/"], [0], [1], [1])


def test_reverse_only_delimiters():
    assert tok(reverse_path_hierarchy_tokens("//")) == (
        ["//", "/"], [0, 1], [2, 2], [1, 0])


def test_reverse_end_of_delimiter_skip():
    assert tok(reverse_path_hierarchy_tokens("/a/b/c/", skip=1)) == (
        ["/a/b/", "a/b/", "b/"], [0, 1, 3], [5, 5, 5], [1, 0, 0])


def test_reverse_start_of_char_skip():
    assert tok(reverse_path_hierarchy_tokens("a/b/c", skip=1)) == (
        ["a/b/", "b/"], [0, 2], [4, 4], [1, 0])
