/*
 * classic.Dataset's companion is private[sql]; extensions that construct a
 * Dataset from a hand-built LogicalPlan conventionally bridge through a
 * one-liner in the org.apache.spark.sql package.  Nothing else lives here.
 */
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => CDataset, SparkSession => CSparkSession}

object EmulatingHadoopDatasetBridge {
  def ofRows(session: CSparkSession, plan: LogicalPlan): CDataset[Row] =
    CDataset.ofRows(session, plan)
}
