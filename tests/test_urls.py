from markdown_lab_ray.kernels.urls import (
    extract_base_url,
    get_domain_from_url,
    get_filename_from_url,
    get_url_path_parts,
    is_absolute_url,
    normalize_url,
    sanitize_filename_part,
    url_seen_key,
    validate_url,
)


def test_validate_url():
    assert validate_url("https://example.com") == (True, None)
    ok, err = validate_url("not-a-url")
    assert not ok and "http" in err
    assert validate_url("")[0] is False


def test_normalize_url():
    assert normalize_url("https://example.com/path/") == "https://example.com/path"
    assert normalize_url("https://example.com/page#section") == "https://example.com/page"
    assert normalize_url("https://example.com/") == "https://example.com/"
    assert normalize_url("https://example.com/p?q=1#f") == "https://example.com/p?q=1"


def test_url_seen_key_is_normalized_md5():
    assert url_seen_key("https://e.com/x/") == url_seen_key("https://e.com/x#frag")
    assert len(url_seen_key("https://e.com/x")) == 32


def test_base_and_domain():
    assert extract_base_url("https://example.com/path/page?query=1") == "https://example.com"
    assert get_domain_from_url("https://sub.example.com/path") == "sub.example.com"


def test_is_absolute():
    assert is_absolute_url("https://example.com/path")
    assert not is_absolute_url("/relative/path")


def test_path_parts_and_sanitize():
    assert get_url_path_parts("https://example.com/path/to/page") == ["path", "to", "page"]
    assert sanitize_filename_part("hello/world:test") == "hello_world_test"


def test_filename_from_url():
    assert get_filename_from_url("https://example.com/path/to/page", "markdown") == \
        "example.com_path_to_page.md"
    assert get_filename_from_url("https://example.com/", "json") == "example.com_.json"
    long_url = "https://example.com/" + "a" * 300
    name = get_filename_from_url(long_url, "xml")
    assert len(name) <= 255
    assert name.endswith(".xml")
