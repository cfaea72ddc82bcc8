# testthat-style checks for the R host (base-R fallbacks when testthat is
# not installed). Run: Rscript ports/r/test_mcpower.R
# Requires: python with mcpower_tpu importable (set MCPOWER_PYTHON or
# PYTHONPATH as needed).

source(file.path(dirname(sub("--file=", "", grep("--file=", commandArgs(FALSE),
                                                 value = TRUE))), "mcpower.R"))

expect_true <- function(x, label) {
  if (!isTRUE(x)) stop("FAIL: ", label)
  cat("ok:", label, "\n")
}

spec <- mcp_spec(
  outcome = "y", predictors = c("x1", "x2"),
  effects = c(x1 = 0.45, x2 = 0.3),
  n_sims = 200, seed = 42
)

# 1. power at one N round-trips the wire with a rendered summary
res <- mcp_find_power(spec, 150)
expect_true(grepl("MCPower", res$json), "payload carries the report header")
expect_true(grepl('"uncorrected"', res$json), "payload carries power rates")
p <- if (!is.null(res$parsed)) {
  unlist(res$parsed$result$powers$uncorrected)
} else {
  res$power_uncorrected
}
expect_true(length(p) == 2, "two per-test powers")
expect_true(p[1] > p[2], "larger effect => more power")
expect_true(all(p >= 0 & p <= 1), "powers are proportions")

# 2. sample-size search returns the crossing-fit block
res2 <- mcp_find_sample_size(spec, from = 40, to = 200)
expect_true(grepl('"fitted"', res2$json), "crossing fits present")
expect_true(grepl('"first_achieved"', res2$json), "first-achieved present")

# 3. determinism across invocations (same seed, fresh process)
res3 <- mcp_find_power(spec, 150)
expect_true(identical(res$json, res3$json), "cross-process determinism")

# 4. golden wire: the JSON writer's output must parse to EXACTLY the
# committed fixture documents (the same payloads tests/test_r_port.py
# replays through the engine — the two sides meet at the fixture, so the
# R writer is pinned even though CI images differ in what they can run).
.r_dir <- dirname(sub("--file=", "", grep("--file=", commandArgs(FALSE),
                                          value = TRUE)))
.golden <- function(name) file.path(.r_dir, "tests", "golden", name)

.canon <- function(x) {
  # order-insensitive structural normalization for comparison
  if (is.list(x)) {
    nm <- names(x)
    if (!is.null(nm) && any(nzchar(nm))) {
      x <- x[order(nm)]
      return(lapply(x, .canon))
    }
    return(lapply(x, .canon))
  }
  if (is.numeric(x)) return(round(as.numeric(x), 10))
  x
}

golden_specs <- list(
  mixed_intercept.json = mcp_spec(
    outcome = "y", predictors = c("x1", "x2"),
    effects = c(x1 = 0.4, x2 = 0.25),
    family = "mixed", cluster_name = "site", icc = 0.2, n_clusters = 12,
    n_sims = 60, seed = 7
  ),
  mixed_slopes_extras.json = mcp_spec(
    outcome = "y", predictors = c("x1", "x2"),
    effects = c(x1 = 0.4, x2 = 0.25),
    family = "mixed", cluster_name = "site", icc = 0.1, n_clusters = 12,
    slopes = list(list(predictor_name = "x1", slope_variance = 0.1,
                       slope_intercept_corr = 0.2)),
    extra_groupings = list(list(
      relation = list(kind = "crossed", n_clusters = 8),
      tau_squared = 0.05, cluster_name = "rater"
    )),
    n_sims = 60, seed = 7
  ),
  mixed_binary.json = mcp_spec(
    outcome = "y", predictors = "x1", effects = c(x1 = 0.3),
    family = "mixed", cluster_name = "site", icc = 0.2, n_clusters = 12,
    mixed_outcome = list(kind = "binary", baseline_probability = 0.3,
                         link = "logit"),
    n_sims = 60, seed = 3,
    tests = list(kind = "effects", names = list("x1"))
  ),
  scenarios_holm.json = mcp_spec(
    outcome = "y", predictors = c("x1", "x2"),
    effects = c(x1 = 0.35, x2 = 0.25),
    correction = "holm",
    scenarios = c("optimistic", "realistic", "doomer"),
    n_sims = 80, seed = 11
  ),
  factor_posthoc.json = mcp_spec(
    outcome = "y", predictors = c("g", "x1"),
    effects = c("g[2]" = 0.4, "g[3]" = 0.25, x1 = 0.3),
    var_types = list(
      list(kind = "factor", name = "g", factor_n_levels = 3,
           factor_proportions = c(0.4, 0.3, 0.3), factor_reference = 0),
      list(kind = "numeric", name = "x1")
    ),
    posthoc = TRUE,
    n_sims = 80, seed = 5
  ),
  corr_binary.json = mcp_spec(
    outcome = "y", predictors = c("x1", "x2", "x3"),
    effects = c(x1 = 0.3, x2 = 0.2, x3 = 0.2),
    var_types = list(
      list(kind = "numeric", name = "x1"),
      list(kind = "binary", name = "x2", binary_proportion = 0.4),
      list(kind = "numeric", name = "x3")
    ),
    correlations = list(names = list("x1", "x3"),
                        values = list(c(1, 0.3), c(0.3, 1))),
    n_sims = 80, seed = 13
  ),
  mixed_agq_hessian.json = mcp_spec(
    outcome = "y", predictors = "x1", effects = c(x1 = 0.35),
    family = "mixed", cluster_name = "site", icc = 0.15, n_clusters = 16,
    mixed_outcome = list(kind = "binary", baseline_probability = 0.25,
                         link = "logit"),
    wald_se = "hessian", agq = 7,
    n_sims = 60, seed = 9
  ),
  poisson_rate.json = mcp_spec(
    outcome = "y", predictors = c("x1", "x2"),
    effects = c(x1 = 0.2, x2 = 0.15),
    family = "poisson", baseline_rate = 1.5,
    scenarios = c("optimistic", "realistic"),
    n_sims = 80, seed = 21
  ),
  upload_partial.json = mcp_upload(
    mcp_spec(
      outcome = "y", predictors = c("x1", "x2"),
      effects = c(x1 = 0.45, x2 = 0.3), n_sims = 120, seed = 42
    ),
    data.frame(
      x1 = c(0.1, -0.4, 1.2, 0.7, -1.1, 0.3, -0.8, 1.5, -0.2, 0.9,
             -1.3, 0.6, 0.0, -0.5, 1.1, -0.9, 0.4, 1.8, -1.6, 0.2,
             0.8, -0.3, 1.4, -0.7, 0.5),
      x2 = c(1.0, 0.2, -0.6, 1.3, 0.4, -1.2, 0.7, -0.1, 1.6, -0.9,
             0.3, 1.1, -0.4, 0.8, -1.5, 0.6, 0.0, -0.8, 1.2, 0.5,
             -1.0, 0.9, -0.2, 1.7, -0.5)
    ),
    mode = "partial"
  )
)

if (requireNamespace("jsonlite", quietly = TRUE)) {
  for (nm in names(golden_specs)) {
    built <- jsonlite::fromJSON(.mcp_json(golden_specs[[nm]]),
                                simplifyVector = FALSE)
    want <- jsonlite::fromJSON(paste(readLines(.golden(nm), warn = FALSE),
                                     collapse = "\n"),
                               simplifyVector = FALSE)
    expect_true(identical(.canon(built), .canon(want)),
                paste("golden wire:", nm))
  }
} else {
  # no jsonlite: spot-check load-bearing substrings of the emitted JSON
  j <- .mcp_json(golden_specs[["mixed_slopes_extras.json"]])
  for (s in c('"family":"mixed"', '"cluster_name":"site"', '"icc":0.1',
              '"kind":"n_clusters"', '"slope_variance":0.1',
              '"kind":"crossed"', '"tau_squared":0.05')) {
    expect_true(grepl(s, j, fixed = TRUE), paste("wire fragment", s))
  }
}

# 5. mixed model end-to-end through the engine (the VERDICT r3 #5 bar)
mres <- mcp_find_power(golden_specs[["mixed_intercept.json"]], 120)
expect_true(grepl('"uncorrected"', mres$json), "mixed payload carries power")
expect_true(grepl("MCPower", mres$json), "mixed payload carries the report")
mcp_summary(mres)

# 6. progress-streamed run completes through the interruptible worker path
# (the JSONL ticks appear on stderr; the payload is unchanged)
pres <- mcp_find_power(spec, 150, progress = TRUE)
expect_true(identical(pres$json, res$json),
            "progress-streamed run returns the identical payload")

cat("ALL R HOST CHECKS PASSED\n")
