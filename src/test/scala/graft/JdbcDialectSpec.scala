package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.jdbc.JdbcDialects
import org.apache.spark.sql.types._

/** The reference's MySQL path (mysql-connector-python,
  * simple_etl.py:101,115,400) maps onto Spark's built-in MySQL dialect:
  * this pins the registry resolution and the concrete dialect deltas
  * (identifier quoting, string/boolean DDL types) that differ from the
  * Derby instance the suite exercises live — the documented contract
  * for pointing graft at a real MySQL with only a driver-jar change.
  */
class JdbcDialectSpec extends AnyFunSuite {

  test("mysql URLs resolve to the built-in MySQL dialect") {
    val d = JdbcDialects.get("jdbc:mysql://host:3306/db")
    assert(d.getClass.getSimpleName.toLowerCase.contains("mysql"),
      s"expected the MySQL dialect, got ${d.getClass.getName}")
    // backtick quoting is the observable dialect delta vs Derby's
    // double-quote ANSI quoting
    assert(d.quoteIdentifier("a`b") == "`a``b`")
  }

  test("dialect-generated DDL types differ from Derby where MySQL requires") {
    val my = JdbcDialects.get("jdbc:mysql://host/db")
    val derby = JdbcDialects.get("jdbc:derby:memory:x")
    def ddl(d: org.apache.spark.sql.jdbc.JdbcDialect, t: DataType): Option[String] =
      d.getJDBCType(t).map(_.databaseTypeDefinition)
    // strings: MySQL has no unbounded VARCHAR default -> TEXT family;
    // Derby falls back to Spark's generic TEXT via CLOB
    assert(ddl(my, StringType).isDefined)
    assert(ddl(derby, StringType).exists(_.toUpperCase.contains("CLOB")))
    // booleans: MySQL materializes BIT(1)/BOOLEAN, Derby BOOLEAN
    assert(ddl(my, BooleanType).isDefined)
  }
}
