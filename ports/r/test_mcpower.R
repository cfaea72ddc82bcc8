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

cat("ALL R HOST CHECKS PASSED\n")
