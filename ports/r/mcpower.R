# MCPower R host over the mcpower_tpu AppSpec CLI boundary.
#
# "One engine, N ports" (reference ports/r/R/mcpower.R:16): this host holds
# NO engine logic. It builds the tagged AppSpec JSON document (the same
# GUI-host wire the reference's engine-app-spec crate consumes), shells out
# to `python -m mcpower_tpu app-run|app-search`, and reads back the
# host-neutral {result, plots, summary} payload. Base R only — no package
# dependencies (jsonlite is used for deep parsing when installed; without
# it results are returned as raw JSON plus the extracted headline numbers).

mcp_python <- function() Sys.getenv("MCPOWER_PYTHON", "python3")

# ---- minimal JSON writer (lists -> JSON; base R only) -----------------------

.mcp_json <- function(x) {
  if (is.null(x)) return("null")
  if (is.list(x)) {
    nm <- names(x)
    if (!is.null(nm) && any(nzchar(nm))) {
      pairs <- vapply(seq_along(x), function(i) {
        paste0('"', nm[i], '":', .mcp_json(x[[i]]))
      }, character(1))
      return(paste0("{", paste(pairs, collapse = ","), "}"))
    }
    items <- vapply(x, .mcp_json, character(1))
    return(paste0("[", paste(items, collapse = ","), "]"))
  }
  if (length(x) > 1) {
    return(paste0("[", paste(vapply(x, .mcp_json, character(1)),
                             collapse = ","), "]"))
  }
  if (is.character(x)) return(paste0('"', gsub('"', '\\\\"', x), '"'))
  if (is.logical(x)) return(if (x) "true" else "false")
  format(x, scientific = FALSE, trim = TRUE)
}

# ---- spec builder -----------------------------------------------------------

#' Build an AppSpec document for a linear / logit / poisson model.
#' effects: named numeric vector, e.g. c(x1 = 0.3, x2 = 0.25).
#' var_types: optional list of lists, e.g.
#'   list(list(kind = "binary", name = "x2", binary_proportion = 0.4)).
#'   Predictors without an entry default to numeric.
mcp_spec <- function(outcome, predictors, effects,
                     family = "linear",
                     interaction_terms = list(),
                     var_types = NULL,
                     correlations = NULL,
                     alpha = 0.05, target_power = 0.8,
                     n_sims = 400, seed = 2137,
                     correction = "none",
                     tests = list(kind = "all")) {
  if (is.null(var_types)) {
    var_types <- lapply(predictors, function(p) {
      list(kind = "numeric", name = p)
    })
  }
  eff <- lapply(names(effects), function(nm) {
    list(name = nm, value = unname(effects[[nm]]))
  })
  list(
    family = family,
    parsed_formula = list(
      outcome = outcome,
      predictors = as.list(predictors),
      interaction_terms = interaction_terms
    ),
    var_types = var_types,
    effects = eff,
    correlations = correlations,
    alpha = alpha,
    target_power = target_power,
    n_sims = n_sims,
    seed = seed,
    tests = tests,
    correction = correction,
    csv = NULL
  )
}

# ---- CLI invocation ---------------------------------------------------------

.mcp_call <- function(verb, spec, extra_args) {
  spec_file <- tempfile(fileext = ".json")
  out_file <- tempfile(fileext = ".json")
  on.exit(unlink(spec_file), add = TRUE)
  writeLines(.mcp_json(spec), spec_file)
  status <- system2(
    mcp_python(),
    c("-m", "mcpower_tpu", verb, spec_file, extra_args,
      "--out", out_file, "--compact"),
    stdout = FALSE, stderr = ""
  )
  if (status != 0) stop("mcpower_tpu ", verb, " failed (exit ", status, ")")
  raw <- paste(readLines(out_file, warn = FALSE), collapse = "\n")
  unlink(out_file)
  .mcp_payload(raw)
}

.mcp_payload <- function(raw) {
  out <- list(json = raw)
  if (requireNamespace("jsonlite", quietly = TRUE)) {
    out$parsed <- jsonlite::fromJSON(raw, simplifyVector = FALSE)
    out$summary <- out$parsed$summary
  } else {
    # headline extraction without a JSON package: per-test uncorrected power
    m <- regmatches(raw, regexpr('"uncorrected":\\[\\[[0-9eE.,+-]*\\]\\]', raw))
    if (length(m)) {
      nums <- regmatches(m, gregexpr("[0-9.eE+-]+", m))[[1]]
      out$power_uncorrected <- as.numeric(nums)
    }
    s <- regmatches(raw, regexpr('"summary":".*"\\}?$', raw))
    if (length(s)) out$summary <- gsub('\\\\n', "\n",
                                       sub('"summary":"', "", sub('"\\}$', "", s)))
  }
  out
}

#' Power at a single sample size. Returns list(json, [parsed], [summary], ...).
mcp_find_power <- function(spec, sample_size) {
  .mcp_call("app-run", spec, c("--n", as.character(sample_size)))
}

#' Sample-size search between from and to.
mcp_find_sample_size <- function(spec, from = NULL, to = NULL) {
  args <- character(0)
  if (!is.null(from)) args <- c(args, "--from", as.character(from))
  if (!is.null(to)) args <- c(args, "--to", as.character(to))
  .mcp_call("app-search", spec, args)
}
