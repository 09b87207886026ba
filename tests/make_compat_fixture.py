"""Regenerate the committed format-compat fixture index (run manually ONLY
when a deliberate format break is introduced; the whole point of
tests/test_compat.py is that old indexes keep opening).

    python tests/make_compat_fixture.py
"""

import os
import shutil

import tantivy_tpu as tt

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "compat_index")


def build(path):
    if os.path.exists(path):
        shutil.rmtree(path)
    os.makedirs(path)
    b = tt.Schema.builder()
    b.add_text_field("title", tt.TEXT | tt.STORED_TEXT)
    b.add_text_field("body", tt.TEXT)
    b.add_u64_field("qty", tt.FAST | tt.INDEXED)
    b.add_f64_field("price", tt.FAST)
    b.add_text_field("brand", tt.STRING | tt.FAST)
    b.add_ip_addr_field("ip", tt.INDEXED | tt.FAST)
    index = tt.Index.create_in_dir(path, b.build())
    w = index.writer_for_tests()
    rows = [
        ("old man", "the old man and the sea", 3, 9.5, "acme", "10.0.0.1"),
        ("mice men", "of mice and men", 1, 3.25, "acme", "2001:db8::1"),
        ("sea wolf", "the sea wolf hunts the sea", 7, 12.0, "globex",
         "192.168.1.1"),
        ("old sea", "an old tale of the sea", 2, 1.0, "initech", "::1"),
    ]
    for title, body, qty, price, brand, ip in rows[:2]:
        w.add_document(tt.Document(
            title=title, body=body, qty=qty, price=price, brand=brand, ip=ip,
        ))
    w.commit()  # two segments
    for title, body, qty, price, brand, ip in rows[2:]:
        w.add_document(tt.Document(
            title=title, body=body, qty=qty, price=price, brand=brand, ip=ip,
        ))
    w.delete_term(tt.Term.from_field_text("body", "wolf"))
    w.commit()
    w.close()


if __name__ == "__main__":
    build(FIXTURE)
    print(f"fixture written to {FIXTURE}")
