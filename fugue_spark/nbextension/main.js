// Classic Jupyter Notebook extension: FugueSQL cell highlighting + magic
// auto-detection. Parity surface: the reference ships an equivalent
// nbextension (reference fugue_notebook/nbextension/main.js); this file is
// written against the CodeMirror / classic-notebook APIs directly, with the
// keyword set matching fugue_spark.sql.tokenizer (see notebook.highlight_js,
// the single-source generator used for in-session setup()).
define([
  "base/js/namespace",
  "codemirror/lib/codemirror",
  "notebook/js/codecell",
], function (Jupyter, CodeMirror, codecell) {
  "use strict";

  function toSet(s) {
    var o = {};
    s.split(" ").forEach(function (w) {
      if (w) o[w] = true;
    });
    return o;
  }

  // statement keywords (tokenizer.STATEMENT_KEYWORDS, lowercased) + clause
  // words — keep in sync with fugue_spark/notebook.py highlight_js()
  var statementWords =
    "alter broadcast checkpoint connect create deterministic drop fill " +
    "load module outtransform output persist print process rename sample " +
    "save select sub take transform with yield zip";
  var clauseWords =
    "using schema params prepartition by presort single weak strong lazy " +
    "rows row overwrite append to if exists parquet csv json like from " +
    "where and or callback compiled dataframe file as hash rand even " +
    "coarse seed replace stratify outer inner left right full semi anti " +
    "cross columns nulls percent rowcount concurrency title table union " +
    "intersect except distinct all";

  function registerMime() {
    CodeMirror.defineMIME("text/x-fsql", {
      name: "sql",
      keywords: toSet(statementWords + " " + clauseWords),
      builtin: toSet("str int long float double bool date datetime bytes"),
      atoms: toSet("true false null"),
    });
    CodeMirror.modeInfo.push({
      name: "Fugue SQL",
      mime: "text/x-fsql",
      mode: "sql",
    });
  }

  function attachMagicHighlight() {
    codecell.CodeCell.options_default.highlight_modes["magic_text/x-fsql"] = {
      reg: [/^%%fsql/],
    };
    Jupyter.notebook.events.on("kernel_ready.Kernel", function () {
      Jupyter.notebook.get_cells().forEach(function (cell) {
        if (cell.cell_type === "code") {
          cell.auto_highlight();
        }
      });
    });
  }

  function load_ipython_extension() {
    registerMime();
    attachMagicHighlight();
  }

  return { load_ipython_extension: load_ipython_extension };
});
