#!/usr/bin/env python3
"""Independent Python oracle for the risk-scoring engine.

Re-implements the semantics of the reference engine
(/root/reference/core/analytics.py) using pandas/numpy primitives so the
Scala port can be cross-checked on randomized series. scipy/statsmodels
are unavailable in this container, so the Poisson/NegBin tails and the
classical additive decomposition are computed from first principles
(exact pmf summation; 2x12 centered-MA decomposition identical to
statsmodels seasonal_decompose).

Usage: python3 scripts/risk_oracle.py <n_cases> <out_tsv>
Emits TSV: id, start_ym, values(;), grade, target_ym, asof(YYYY-MM-DD),
           score, status, reason
"""
import calendar
import math
import sys
from datetime import date

import numpy as np
import pandas as pd

MIN_DATA_POINTS = 3
MIN_SAMPLE_FOR_NB = 6
EWMA_LAMBDA = 0.2
NELSON_WINDOW_BIAS = 9
NELSON_WINDOW_TREND = 6
STL_MIN_PERIODS = 24
SCORE_CRITICAL_BONUS = 10
SCORE_NELSON_DEV = 30
SCORE_NELSON_BIAS = 20
SCORE_NELSON_TREND = 20
SCORE_MOMENTUM = 15
SCORE_PARTIAL_ABS = 30
SCORE_PARTIAL_VEL = 40
SCORE_PARTIAL_WARN = 30
THRESHOLD_RED_CRIT = 75
THRESHOLD_RED_GEN = 85
THRESHOLD_YEL_CRIT = 50
THRESHOLD_YEL_GEN = 60
MIN_PROGRESS_FOR_VELOCITY = 0.2
CRITICAL_GRADES = {"중대", "위험", "사고"}


def poisson_cdf(k, mu):
    k = math.floor(k)
    if k < 0:
        return 0.0
    if mu <= 0:
        return 1.0
    pmf = math.exp(-mu)
    cdf = pmf
    for i in range(1, k + 1):
        pmf *= mu / i
        cdf += pmf
    return min(1.0, cdf)


def nbinom_cdf(k, r, p):
    k = math.floor(k)
    if k < 0:
        return 0.0
    pmf = p ** r
    cdf = pmf
    for i in range(1, k + 1):
        pmf *= (i + r - 1.0) / i * (1.0 - p)
        cdf += pmf
    return min(1.0, cdf)


def seasonal_decompose_additive(values, period=12):
    """Classical additive decomposition == statsmodels seasonal_decompose."""
    n = len(values)
    half = period // 2
    trend = np.full(n, np.nan)
    for t in range(half, n - half):
        s = 0.5 * values[t - half] + 0.5 * values[t + half]
        s += sum(values[t - half + 1:t + half])
        trend[t] = s / period
    phase_sum = np.zeros(period)
    phase_cnt = np.zeros(period, dtype=int)
    for i in range(n):
        if not np.isnan(trend[i]):
            phase_sum[i % period] += values[i] - trend[i]
            phase_cnt[i % period] += 1
    phase_avg = np.where(phase_cnt > 0, phase_sum / np.maximum(phase_cnt, 1), 0.0)
    phase_avg = phase_avg - phase_avg.mean()
    seasonal = np.array([phase_avg[i % period] for i in range(n)])
    resid = values - trend - seasonal
    return trend, seasonal, resid


def calculate(series: pd.Series, grade, target_month_str, today: date):
    """series: pd.Series of counts indexed by Timestamp (month starts)."""
    series = series.sort_index()
    is_critical = grade in CRITICAL_GRADES if grade else False

    is_partial = False
    progress = 1.0
    if target_month_str:
        td = pd.to_datetime(target_month_str)
        if td.year == today.year and td.month == today.month:
            is_partial = True
            dom = max(1, today.day)
            dim = calendar.monthrange(td.year, td.month)[1]
            progress = dom / dim

    if len(series) > 0:
        current = float(series.iloc[-1])
        current_date = series.index[-1]
        history = series.iloc[:-1]
    else:
        current = 0.0
        current_date = None
        history = pd.Series(dtype=float)

    n_obs = len(history)
    mean = history.mean() if n_obs > 0 else 0.0
    std = history.std() if n_obs > 1 else 0.0
    var = history.var() if n_obs > 1 else 0.0
    zero_ratio = (history == 0).sum() / n_obs if n_obs > 0 else 0
    is_sparse = (mean < 1.0) or (zero_ratio > 0.5)

    if current == 0:
        return 0, "", "발생 없음"

    partial_penalty = 0
    partial_reason = ""
    if is_partial and current > 1:
        if current >= mean and mean > 0 and progress < 0.7:
            partial_penalty = SCORE_PARTIAL_ABS
            partial_reason = "상승세 가속"
        elif progress >= MIN_PROGRESS_FOR_VELOCITY:
            expected = mean * progress
            if expected > 0.5 and current > expected * 4.0:
                partial_penalty = SCORE_PARTIAL_VEL
                partial_reason = "상승세 가속"
            elif expected > 0.5 and current > expected * 2.5 and is_critical:
                partial_penalty = SCORE_PARTIAL_WARN
                partial_reason = "상승세 가속"

    if n_obs < MIN_DATA_POINTS:
        if is_critical:
            if current >= 2:
                return 100, "🔴", f"초기급증({partial_reason})"
            # falls through (reference behavior)
        else:
            if current >= 3:
                return 50, "🟡", f"초기주의({partial_reason})"
            return 0, "⚪", "데이터 부족"

    total = 0.0
    method = ""
    triggered = []
    z_val = 0.0

    if is_sparse:
        if mean == 0:
            prob = 100.0 if current > 0 else 0.0
            method = "희소유형 돌발 발생"
        else:
            use_nb = n_obs >= MIN_SAMPLE_FOR_NB and var > 1.2 * mean
            if use_nb:
                p_est = mean / var
                r_est = mean * p_est / (1 - p_est)
                p_val = 1 - nbinom_cdf(current - 1, r_est, p_est)
            else:
                p_val = 1 - poisson_cdf(current - 1, mean)
            method = "분포 이탈"
            if p_val < 1e-5:
                prob = 100.0
            else:
                prob = min(100.0, max(0.0, -math.log10(p_val) * 25))
        prev = history.iloc[-1] if len(history) > 0 else 0
        trend_score = 20 if (prev > 0 and current / prev >= 3.0 and current >= 3) else 0
        total = prob + trend_score
    else:
        z_method = "평균 대비 급증"
        z = (current - mean) / (std + 1e-6)
        if n_obs >= STL_MIN_PERIODS and std > 0:
            try:
                vals = history.to_numpy(dtype=float)
                trend_c, seasonal_c, resid_c = seasonal_decompose_additive(vals)
                residuals = resid_c[~np.isnan(resid_c)]
                resid_mean = residuals.mean()
                resid_std = residuals.std(ddof=1)
                last_trend = trend_c[~np.isnan(trend_c)][-1]
                tmi = current_date.month
                hist_months = np.array([ts.month for ts in history.index])
                svals = seasonal_c[hist_months == tmi]
                current_seasonal = svals.mean()
                expected_val = last_trend + current_seasonal
                z2 = (current - expected_val - resid_mean) / (resid_std + 1e-6)
                if not np.isnan(z2):
                    z = z2
                    z_method = "정상패턴 이탈"
            except Exception:
                pass
        z_val = z
        method = z_method
        start_sigma = 0.5 if is_critical else 1.0
        base = min(50, max(0, (z - start_sigma) * 25.0))

        cv = (std / mean) if mean > 0 else 0
        base_limit = 2.5 if is_critical else 3.0
        if cv < 0.1 and mean > 1.0:
            limit_z = 2.0
        elif cv > 0.5:
            limit_z = 3.5
        else:
            limit_z = base_limit
        warn_z = max(1.5, limit_z - 1.0)
        nelson = 0.0
        full = series
        if abs(z) > limit_z:
            triggered.append("정상범위 이탈")
            nelson += SCORE_NELSON_DEV
        elif abs(z) > warn_z:
            nelson += SCORE_NELSON_DEV / 2
        if len(full) >= NELSON_WINDOW_BIAS:
            last_n = full.iloc[-NELSON_WINDOW_BIAS:]
            if (last_n > mean).all():
                triggered.append(f"지속적 상승 - {NELSON_WINDOW_BIAS}개월")
                nelson += SCORE_NELSON_BIAS
        if len(full) >= NELSON_WINDOW_TREND:
            last_n = full.iloc[-NELSON_WINDOW_TREND:]
            diffs = last_n.diff().dropna()
            if (diffs > 0).all():
                triggered.append(f"지속적 상승 - ({NELSON_WINDOW_TREND}개월)")
                nelson += SCORE_NELSON_TREND

        ewma = series.ewm(alpha=EWMA_LAMBDA, adjust=False).mean()
        z_ewma = (ewma.iloc[-1] - mean) / (
            std * math.sqrt(EWMA_LAMBDA / (2 - EWMA_LAMBDA)) + 1e-6)
        ewma_score = 15.0 if abs(z_ewma) > 3.0 else 0.0
        # _calculate_velocity_score is undefined in the reference → 0
        total = base + nelson + ewma_score

    momentum = 0.0
    if n_obs >= 2:
        t1, t2 = history.iloc[-1], history.iloc[-2]
        if current > t1 and t1 > t2 and current >= 3:
            momentum = SCORE_MOMENTUM
    if momentum > 0:
        triggered.append("연속 상승 모멘텀")
    total += momentum

    total += partial_penalty
    if is_critical and total > 0:
        total += SCORE_CRITICAL_BONUS
    total = min(100, total)

    if not is_sparse:
        in_safe = (current < 3) and (z_val < 0.8)
        if in_safe and not triggered and not partial_reason:
            return 0, "⚪", "정상범주"

    if current == 1:
        first = mean == 0
        rare = is_sparse and (len(history) > 0 and history.iloc[-1] == 0)
        if first or rare:
            if not is_critical:
                total = min(total, THRESHOLD_YEL_GEN - 1)
        else:
            total = min(total, 30)
            partial_reason = ""

    parts = []
    if partial_reason:
        parts.append(partial_reason)
    parts.extend(triggered)
    if not parts:
        parts.append(method)

    sudden = [p for p in parts if any(x in p for x in ["희소유형 돌발 발생", "분포 이탈"])]
    trend_c = [p for p in parts if any(x in p for x in ["정상패턴 이탈", "정상범위 이탈", "평균 대비 급증"])]
    mom_c = [p for p in parts if any(x in p for x in ["지속적 상승", "연속 상승 모멘텀", "상승세 가속"])]

    reason = ""
    if sudden:
        reason = f"⚡돌발감지({', '.join(sudden)})"
    if trend_c:
        reason += (" / " if reason else "") + f"📊추세이탈({', '.join(trend_c)})"
    if mom_c:
        reason += (" / " if reason else "") + f"📈급증감지({', '.join(mom_c)})"
    if not reason:
        reason = method if method else "정상범주"

    thr_red = THRESHOLD_RED_CRIT if is_critical else THRESHOLD_RED_GEN
    thr_yel = THRESHOLD_YEL_CRIT if is_critical else THRESHOLD_YEL_GEN
    status = "⚪"
    if total >= thr_red:
        status = "🔴"
    elif total >= thr_yel:
        status = "🟡"
    if is_sparse and current == 2 and is_critical and mean >= 0.5:
        status = "🟡"

    if status == "⚪":
        return int(total), "⚪", "정상범주"
    return int(total), status, reason


def ui_wrapper(history: pd.Series, target_month_str, grade, today: date):
    """ref: core/analytics.py:411-426."""
    try:
        target_ts = pd.to_datetime(target_month_str)
        if target_ts in history.index:
            relevant = history.loc[:target_ts]
        else:
            return "🟢", 0, "당월0건"
        score, status, reason = calculate(relevant, grade, target_month_str, today)
        return status, score, reason
    except Exception:
        return "⚪", 0, "Err"


def main():
    n_cases, out = int(sys.argv[1]), sys.argv[2]
    rng = np.random.default_rng(42)
    grades = [None, "일반", "중대", "위험", "사고"]
    rows = []
    for i in range(n_cases):
        n = int(rng.integers(1, 60))
        kind = i % 5
        if kind == 0:          # sparse with zeros
            vals = rng.poisson(0.4, n).astype(float)
        elif kind == 1:        # dense stable
            vals = rng.poisson(8.0, n).astype(float)
        elif kind == 2:        # dense seasonal + trend
            t = np.arange(n)
            vals = np.round(8 + 3 * np.sin(2 * np.pi * t / 12) + 0.1 * t
                            + rng.normal(0, 1, n)).clip(0)
        elif kind == 3:        # surge at the end
            vals = rng.poisson(2.0, n).astype(float)
            vals[-1] = vals[-1] + int(rng.integers(3, 15))
        else:                  # rising run
            vals = np.maximum.accumulate(rng.poisson(3.0, n).astype(float))
            vals[-min(6, n):] += np.arange(min(6, n))
        start = pd.Timestamp(2021, int(rng.integers(1, 13)), 1)
        idx = pd.date_range(start, periods=n, freq="MS")
        series = pd.Series(vals, index=idx)
        grade = grades[int(rng.integers(0, len(grades)))]
        target = idx[-1]
        # mix of partial-month (asof inside target month) and closed months
        if i % 3 == 0:
            asof = date(target.year, target.month, int(rng.integers(1, 28)))
        else:
            asof = date(2030, 1, 15)
        score, status, reason = calculate(series, grade, target.strftime("%Y-%m"), asof)
        rows.append("\t".join([
            str(i), idx[0].strftime("%Y-%m"),
            ";".join(str(v) for v in vals),
            grade or "", target.strftime("%Y-%m"), asof.isoformat(),
            str(score), status, reason]))
    with open(out, "w") as f:
        f.write("\n".join(rows) + "\n")
    print(f"wrote {len(rows)} cases to {out}")


if __name__ == "__main__":
    main()
