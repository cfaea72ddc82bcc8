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

#' Build an AppSpec document (the tagged GUI wire, app_spec.rs:46-52).
#'
#' Families: "linear" | "logit" | "poisson" | "mixed" (reference R6 class
#' surface, ports/r/R/mcpower.R:16). effects: named numeric vector, e.g.
#' c(x1 = 0.3, x2 = 0.25). var_types: optional list of lists, e.g.
#'   list(list(kind = "binary", name = "x2", binary_proportion = 0.4)).
#'   Predictors without an entry default to numeric.
#'
#' Mixed-model fields (family = "mixed"):
#'   cluster_name  name of the grouping variable (not a predictor)
#'   icc           intraclass correlation, converted family-aware to tau^2
#'                 by the engine (projection _tau_squared)
#'   n_clusters / cluster_size  exactly one cluster sizing dimension
#'   slopes        list(list(predictor_name=, slope_variance=,
#'                 slope_intercept_corr=)) random slopes on the primary
#'   extra_groupings  list(list(relation=list(kind="crossed", n_clusters=k)
#'                 | list(kind="nested_within", n_per_parent=k),
#'                 tau_squared=, cluster_name=)) crossed/nested factors
#'   mixed_outcome NULL (gaussian) or list(kind="binary",
#'                 baseline_probability=, link=) or list(kind="poisson",
#'                 baseline_rate=, tau_squared=)
#'   cluster_level_vars  predictors constant within cluster
#'
#' GLM fields: baseline_probability (logit), baseline_rate (poisson).
#' scenarios: character vector of preset labels ("optimistic", "realistic",
#' "doomer") fanned out per run. wald_se: "rx" | "hessian"; agq: odd nAGQ.
mcp_spec <- function(outcome, predictors, effects,
                     family = "linear",
                     interaction_terms = list(),
                     var_types = NULL,
                     correlations = NULL,
                     alpha = 0.05, target_power = 0.8,
                     n_sims = 400, seed = 2137,
                     correction = "none",
                     tests = list(kind = "all"),
                     baseline_probability = NULL,
                     baseline_rate = NULL,
                     cluster_name = NULL, icc = NULL,
                     n_clusters = NULL, cluster_size = NULL,
                     slopes = NULL, extra_groupings = NULL,
                     mixed_outcome = NULL,
                     cluster_level_vars = NULL,
                     scenarios = NULL,
                     wald_se = NULL, agq = NULL,
                     posthoc = FALSE,
                     csv = NULL) {
  if (is.null(var_types)) {
    var_types <- lapply(predictors, function(p) {
      list(kind = "numeric", name = p)
    })
  }
  eff <- lapply(names(effects), function(nm) {
    list(name = nm, value = unname(effects[[nm]]))
  })
  spec <- list(
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
    csv = csv
  )
  if (family == "logit" && !is.null(baseline_probability)) {
    spec$baseline_probability <- baseline_probability
  }
  if (family == "poisson" && !is.null(baseline_rate)) {
    spec$baseline_rate <- baseline_rate
  }
  if (family == "mixed") {
    if (is.null(cluster_name) || is.null(icc)) {
      stop("family='mixed' requires cluster_name and icc")
    }
    if (is.null(n_clusters) == is.null(cluster_size)) {
      stop("family='mixed' requires exactly one of n_clusters / cluster_size")
    }
    spec$cluster_name <- cluster_name
    spec$icc <- icc
    spec$cluster_dim <- if (!is.null(n_clusters)) {
      list(kind = "n_clusters", value = n_clusters)
    } else {
      list(kind = "cluster_size", value = cluster_size)
    }
    if (!is.null(slopes)) spec$slopes <- slopes
    if (!is.null(extra_groupings)) spec$extra_groupings <- extra_groupings
    # the wire key for the mixed-outcome block is "outcome" (app_spec.rs
    # MixedOutcome tagged enum; parse_app_spec reads doc["outcome"])
    if (!is.null(mixed_outcome)) spec$outcome <- mixed_outcome
    if (!is.null(cluster_level_vars)) {
      spec$cluster_level_vars <- as.list(cluster_level_vars)
    }
  }
  if (!is.null(scenarios)) spec$scenarios <- as.list(scenarios)
  if (!is.null(wald_se)) spec$wald_se <- wald_se
  if (!is.null(agq)) spec$agq <- agq
  # all-pairwise factor contrasts (the reference app's posthoc editor;
  # maps to the engine's "all-posthoc" target token)
  if (isTRUE(posthoc)) spec$posthoc <- TRUE
  spec
}

#' Attach uploaded pilot data to a spec (reference upload_data,
#' model.py:841): df is a data.frame (numeric and factor/character
#' columns), mode "partial" (NORTA moment reuse) or "strict" (row
#' bootstrap). Factor/character columns are passed as numeric level codes.
mcp_upload <- function(spec, df, mode = "partial") {
  cols <- list()
  for (nm in names(df)) {
    v <- df[[nm]]
    if (is.factor(v) || is.character(v)) v <- as.numeric(as.factor(v))
    cols[[nm]] <- as.numeric(v)
  }
  spec$csv <- list(mode = mode, columns = cols)
  spec
}

# ---- CLI invocation ---------------------------------------------------------

# Interruptible worker invocation (the reference R bridge's main-thread
# progress poll + Ctrl-C -> CancellationToken, engine-r/src/progress.rs,
# re-expressed over a process boundary): the python worker runs detached
# with its PID captured; R polls a done-file in an interruptible
# Sys.sleep loop, and an interrupt (Ctrl-C) kills the worker instead of
# leaving it running. With progress = TRUE the worker's stderr JSONL
# ticks ({"event":"progress","done":d,"total":t}, one per dispatch chunk)
# pass straight through to the R console.
.mcp_call <- function(verb, spec, extra_args, progress = FALSE) {
  spec_file <- tempfile(fileext = ".json")
  out_file <- tempfile(fileext = ".json")
  pid_file <- tempfile()
  done_file <- tempfile()
  on.exit(unlink(c(spec_file, pid_file, done_file)), add = TRUE)
  writeLines(.mcp_json(spec), spec_file)
  args <- c("-m", "mcpower_tpu", verb, spec_file, extra_args,
            "--out", out_file, "--compact")
  if (progress) args <- c(args, "--progress")
  quoted <- paste(vapply(c(mcp_python(), args), shQuote, character(1)),
                  collapse = " ")
  # Background the worker to capture ITS pid ($!), wait on it, and record
  # the exit status in the done-file the R loop polls.
  wrapper <- paste0(quoted, " & echo $! > ", shQuote(pid_file),
                    "; wait $!; echo $? > ", shQuote(done_file))
  system2("sh", c("-c", shQuote(wrapper)), wait = FALSE,
          stdout = FALSE, stderr = "")
  status <- tryCatch({
    while (!file.exists(done_file) ||
           !length(readLines(done_file, warn = FALSE))) {
      Sys.sleep(0.2)
    }
    as.integer(readLines(done_file, warn = FALSE)[1])
  }, interrupt = function(cond) {
    pid <- tryCatch(readLines(pid_file, warn = FALSE)[1],
                    error = function(e) NULL)
    if (!is.null(pid) && nzchar(pid)) {
      system(paste("kill", pid), ignore.stderr = TRUE)
    }
    stop("mcpower_tpu ", verb, " interrupted; worker killed", call. = FALSE)
  })
  if (is.na(status) || status != 0) {
    stop("mcpower_tpu ", verb, " failed (exit ", status, ")")
  }
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
#' progress = TRUE streams per-chunk ticks to the console; Ctrl-C during a
#' run kills the worker process (cooperative cancel between chunks).
mcp_find_power <- function(spec, sample_size, progress = FALSE) {
  .mcp_call("app-run", spec, c("--n", as.character(sample_size)),
            progress = progress)
}

#' Sample-size search between from and to (progress/Ctrl-C as above).
mcp_find_sample_size <- function(spec, from = NULL, to = NULL,
                                 progress = FALSE) {
  args <- character(0)
  if (!is.null(from)) args <- c(args, "--from", as.character(from))
  if (!is.null(to)) args <- c(args, "--to", as.character(to))
  .mcp_call("app-search", spec, args, progress = progress)
}

# ---- result helpers ---------------------------------------------------------

#' Pretty-print a result payload: the engine's own report text (the same
#' boxed summary every host shows — reference output-report.R), falling
#' back to the headline power numbers when only the raw JSON is available.
mcp_summary <- function(result) {
  if (!is.null(result$summary)) {
    cat(result$summary, "\n")
    return(invisible(result$summary))
  }
  if (!is.null(result$power_uncorrected)) {
    cat("power (uncorrected):",
        paste(sprintf("%.3f", result$power_uncorrected), collapse = ", "),
        "\n")
    return(invisible(result$power_uncorrected))
  }
  cat(substr(result$json, 1, 2000), "\n")
  invisible(NULL)
}

#' Extract per-test corrected power as a named numeric vector (requires
#' jsonlite for deep parsing; NULL otherwise). `powers$corrected` is
#' [per-N rows] x [per-target]; this returns the LAST grid point's row
#' (the run's N for find_power; the largest N for a search).
mcp_power <- function(result, scenario = NULL) {
  p <- result$parsed
  if (is.null(p)) return(NULL)
  tree <- p$result
  if (!is.null(tree$scenarios)) {
    lab <- if (is.null(scenario)) names(tree$scenarios)[[1]] else scenario
    tree <- tree$scenarios[[lab]]
  }
  rows <- tree$powers$corrected
  row <- rows[[length(rows)]]
  out <- vapply(row, as.numeric, numeric(1))
  labs <- unlist(tree$target_labels)
  if (!is.null(labs) && length(labs) == length(out)) names(out) <- labs
  out
}
