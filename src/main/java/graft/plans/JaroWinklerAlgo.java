package graft.plans;

import org.apache.spark.unsafe.types.UTF8String;

/**
 * Jaro-Winkler similarity kernel, shared verbatim by the interpreted and
 * whole-stage-codegen paths of {@link JaroWinkler} (the generated Java
 * calls this static directly — one definition, no eval/codegen drift).
 *
 * The variant is the classic Winkler formulation the DuckDB oracle
 * implements (differential-tested in JaroWinklerSpec): match window
 * floor(max(|a|,|b|)/2) - 1 clamped at 0, transpositions = half the
 * out-of-order matches, prefix bonus p = 0.1 over at most 4 leading
 * units, applied only when the Jaro score exceeds the 0.7 boost
 * threshold, and 0.0 whenever either side is empty.
 *
 * Units are raw UTF-8 BYTES read straight off the {@link UTF8String}
 * backing memory — the same units DuckDB's jaro_winkler_similarity
 * operates on — so parity with the oracle holds for non-ASCII input
 * too, and the hot loop of x159's blocked candidate verify allocates
 * no String per pair (ADVICE r9: the previous kernel round-tripped
 * through String.charAt, which was both an allocation per comparison
 * and UTF-16 code-unit semantics). The two small boolean match-flag
 * arrays are the only per-call allocations.
 */
public final class JaroWinklerAlgo {

    private JaroWinklerAlgo() {}

    public static double score(UTF8String a, UTF8String b) {
        int n = a.numBytes(), m = b.numBytes();
        if (n == 0 || m == 0) return 0.0;
        int window = Math.max(Math.max(n, m) / 2 - 1, 0);
        boolean[] am = new boolean[n];
        boolean[] bm = new boolean[m];
        int matches = 0;
        for (int i = 0; i < n; i++) {
            int lo = Math.max(0, i - window);
            int hi = Math.min(m - 1, i + window);
            byte ai = a.getByte(i);
            for (int j = lo; j <= hi; j++) {
                if (!bm[j] && ai == b.getByte(j)) {
                    am[i] = true;
                    bm[j] = true;
                    matches++;
                    break;
                }
            }
        }
        if (matches == 0) return 0.0;
        int t = 0, k = 0;
        for (int i = 0; i < n; i++) {
            if (!am[i]) continue;
            while (!bm[k]) k++;
            if (a.getByte(i) != b.getByte(k)) t++;
            k++;
        }
        double md = matches;
        double jaro = (md / n + md / m + (md - t / 2.0) / md) / 3.0;
        if (jaro <= 0.7) return jaro;
        int cap = Math.min(4, Math.min(n, m));
        int prefix = 0;
        while (prefix < cap && a.getByte(prefix) == b.getByte(prefix)) prefix++;
        return jaro + prefix * 0.1 * (1.0 - jaro);
    }
}
