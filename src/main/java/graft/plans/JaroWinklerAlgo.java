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
 * chars, applied only when the Jaro score exceeds the 0.7 boost
 * threshold, and 0.0 whenever either side is empty.
 */
public final class JaroWinklerAlgo {

    private JaroWinklerAlgo() {}

    public static double score(UTF8String ua, UTF8String ub) {
        String a = ua.toString();
        String b = ub.toString();
        int n = a.length(), m = b.length();
        if (n == 0 || m == 0) return 0.0;
        int window = Math.max(Math.max(n, m) / 2 - 1, 0);
        boolean[] am = new boolean[n];
        boolean[] bm = new boolean[m];
        int matches = 0;
        for (int i = 0; i < n; i++) {
            int lo = Math.max(0, i - window);
            int hi = Math.min(m - 1, i + window);
            for (int j = lo; j <= hi; j++) {
                if (!bm[j] && a.charAt(i) == b.charAt(j)) {
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
            if (a.charAt(i) != b.charAt(k)) t++;
            k++;
        }
        double md = matches;
        double jaro = (md / n + md / m + (md - t / 2.0) / md) / 3.0;
        if (jaro <= 0.7) return jaro;
        int cap = Math.min(4, Math.min(n, m));
        int prefix = 0;
        while (prefix < cap && a.charAt(prefix) == b.charAt(prefix)) prefix++;
        return jaro + prefix * 0.1 * (1.0 - jaro);
    }
}
