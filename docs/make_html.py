"""Render the API reference as an HTML tree with stdlib pydoc (the
reference ships a rendered ODElib_docs.pdf from pdoc+pandoc,
/root/reference/build_docs.sh:1-2; this image has neither, so the
rendered artifact is pydoc HTML plus an index page, with the narrative
guides embedded)."""
import html
import os
import pydoc
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "html")
sys.path.insert(0, os.path.dirname(HERE))  # import odelib_tpu from the repo


def main(modules):
    os.makedirs(OUT, exist_ok=True)
    os.chdir(OUT)  # pydoc.writedoc writes into cwd
    written = []
    for m in modules:
        try:
            pydoc.writedoc(m)
            written.append(m)
        except Exception as e:  # keep going; record the gap on the index
            print(f"skipped {m}: {e}", file=sys.stderr)

    guides = []
    for name, title in (("GUIDE.md", "User guide"),
                        ("DESIGN.md", "Design notes")):
        src = os.path.join(HERE, name)
        if not os.path.exists(src):
            continue
        with open(src) as f:
            body = html.escape(f.read())
        page = name.replace(".md", ".html")
        with open(page, "w") as f:
            f.write(f"<!doctype html><html><head><meta charset='utf-8'>"
                    f"<title>{title} — odelib_tpu</title></head>"
                    f"<body><h1>{title}</h1>"
                    f"<pre style='white-space:pre-wrap;max-width:90ch'>"
                    f"{body}</pre></body></html>\n")
        guides.append((page, title))

    links = "\n".join(
        f"<li><a href='{m}.html'><code>{m}</code></a></li>"
        for m in written)
    glinks = "\n".join(f"<li><a href='{p}'>{t}</a></li>"
                       for p, t in guides)
    with open("index.html", "w") as f:
        f.write(f"""<!doctype html><html><head><meta charset='utf-8'>
<title>odelib_tpu — API documentation</title></head><body>
<h1>odelib_tpu</h1>
<p>TPU-native Bayesian ODE fitting framework (JAX / XLA / Pallas),
providing the full capability surface of
<a href='https://github.com/SEpapoulis/ODElib'>SEpapoulis/ODElib</a>
re-designed for TPU hardware.</p>
<h2>Guides</h2><ul>{glinks}</ul>
<h2>API reference</h2><ul>{links}</ul>
</body></html>
""")
    print(f"wrote {len(written)} module pages + index to {OUT}")


if __name__ == "__main__":
    main(sys.argv[1:])
