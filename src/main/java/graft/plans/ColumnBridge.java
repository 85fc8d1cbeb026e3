package graft.plans;

import org.apache.spark.sql.Column;
import org.apache.spark.sql.SparkSession;
import org.apache.spark.sql.catalyst.expressions.Expression;

/**
 * Java bridge to Spark's classic Column&lt;-&gt;Expression converters and the
 * session FunctionRegistry. These are {@code private[sql]} to Scala code but
 * public at the bytecode level; a Java call site is the supported-JVM way to
 * reach them from an external library (the alternative — placing our classes
 * inside org.apache.spark.sql — would shadow the real package).
 */
public final class ColumnBridge {
    private ColumnBridge() {}

    public static Expression expr(Column c) {
        return org.apache.spark.sql.classic.ExpressionUtils.expression(c);
    }

    public static Column column(Expression e) {
        return org.apache.spark.sql.classic.ExpressionUtils.column(e);
    }

    public static void registerFunction(
            SparkSession session, String name,
            scala.Function1<scala.collection.immutable.Seq<Expression>, Expression> builder) {
        session.sessionState().functionRegistry()
            .createOrReplaceTempFunction(name, builder, "scala_udf");
    }

    /** Wrap a (resolved) logical plan as a DataFrame — the constructor
     *  custom logical operators need ({@code Dataset.ofRows} is
     *  {@code private[sql]}). */
    public static org.apache.spark.sql.Dataset<org.apache.spark.sql.Row> ofRows(
            SparkSession session,
            org.apache.spark.sql.catalyst.plans.logical.LogicalPlan plan) {
        return org.apache.spark.sql.classic.Dataset.ofRows(
            (org.apache.spark.sql.classic.SparkSession) session, plan);
    }
}
